"""Canonical column expressions: coercions, hashing, identity, json.

Pure Column-in/Column-out functions with no I/O — the Spark restatement of
the reference's scalar layer (SURVEY.md §2.8):

- money/float/int/string coercions  (reference scrapers/vgsi/source.py:134-174)
- canonical row hash                 (reference src/engine/hash.py:27-40)
- deterministic entity uuid          (reference scrapers/vgsi/source.py:182-194)
- key normalization, comma-number cleanup, json encode/decode helpers
"""

from ctcityscraper_spark.functions.coercion import (
    clean_string_col,
    float_col,
    int_col,
    money_col,
    normalize_key,
    comma_number_col,
)
from ctcityscraper_spark.functions.hashing import (
    HASH_EXCLUDED_FIELDS,
    compute_row_hash,
    entity_uuid_col,
    hash64,
    md5_uuid_format,
    row_hash_col,
)

__all__ = [
    "clean_string_col",
    "float_col",
    "int_col",
    "money_col",
    "normalize_key",
    "comma_number_col",
    "HASH_EXCLUDED_FIELDS",
    "compute_row_hash",
    "entity_uuid_col",
    "hash64",
    "md5_uuid_format",
    "row_hash_col",
]
