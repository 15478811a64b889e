"""Canonical content hashing and deterministic entity identity.

Reference contract (src/engine/hash.py:27-40): the row hash is
``md5(json.dumps({k: str(v) for sorted k, non-null v, k not excluded},
sort_keys=True))`` with a fixed 13-field metadata exclusion list.

Spark restatement: we keep the *semantics* (sorted keys, null fields dropped,
values stringified, fixed exclusion list, MD5 hex) but define the canonical
serialization by Spark's own rules — ``to_json(struct(...))`` over
string-cast fields in sorted order, which drops NULL fields by default.
This is the engine-canonical hash: every hash this engine ever compares
against was produced by the same expression, so self-consistency (not
CPython byte-parity) is the correctness requirement. See SURVEY.md §7
hard-part #1 for the rationale.

``compute_row_hash`` is the driver-side Python twin producing identical
digests for flat dicts (used at ingest boundaries and in tests).

MIGRATION CAVEAT: hashes are NOT byte-compatible with the reference's
CPython ``json.dumps`` digests (', '/': ' separators, ``str(True)`` ->
'True' vs Spark's compact JSON and 'true'). Refreshing over parquet data
produced by the reference engine would treat every existing row as changed
and append one spurious version each — run
``ParquetStore.rehash_table(table)`` once per adopted table first.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Verbatim from reference src/engine/hash.py:7-24 — metadata fields that are
# never part of the content hash. Preserved exactly (load-bearing for parity).
HASH_EXCLUDED_FIELDS = frozenset(
    {
        "id",
        "version",
        "row_hash",
        "effective_from",
        "effective_to",
        "is_current",
        "loaded_at",
        "updated_at",
        "created_at",
        "scraped_at",
        "city_id",
        "vgsi_url",
        "photo_paths",
        "photo_local_path",
    }
)


def _hashable_fields(
    columns: Iterable[str], extra_exclude: set[str] | None = None
) -> list[str]:
    exclude = HASH_EXCLUDED_FIELDS | (extra_exclude or set())
    return sorted(c for c in columns if c not in exclude)


def row_hash_col(
    columns: Iterable[str], extra_exclude: set[str] | None = None
) -> Column:
    """Canonical MD5 content hash over the given columns.

    ``to_json`` omits NULL fields (matching the reference's null-dropping,
    hash.py:37) and struct field order is our sorted order (matching
    ``sort_keys=True``). All values are string-cast first so type drift
    (int vs long) can't change the hash.
    """
    fields = _hashable_fields(columns, extra_exclude)
    if not fields:
        # Hash of the empty canonical document — mirrors json.dumps({}).
        return F.lit(hashlib.md5(b"{}").hexdigest())
    return F.md5(
        F.to_json(F.struct(*[F.col(c).cast("string").alias(c) for c in fields]))
    )


def compute_row_hash(data: Mapping, extra_exclude: set[str] | None = None) -> str:
    """Python twin of :func:`row_hash_col` for flat dicts.

    Matches the Spark expression byte-for-byte (verified property-based):
    compact separators, raw UTF-8 (no \\uXXXX for non-ASCII), Jackson-style
    control-char escapes. Semantics mirror reference src/engine/hash.py:27-40
    (sorted keys, drop nulls, exclusion list).
    """
    exclude = HASH_EXCLUDED_FIELDS | (extra_exclude or set())
    hash_data = {
        k: _spark_str(v)
        for k, v in sorted(data.items())
        if k not in exclude and v is not None
    }
    canonical = (
        "{"
        + ",".join(
            f'"{_jackson_escape(k)}":"{_jackson_escape(v)}"'
            for k, v in sorted(hash_data.items())
        )
        + "}"
    )
    return hashlib.md5(canonical.encode("utf-8")).hexdigest()


_JSON_SHORTCUTS = {
    '"': '\\"',
    "\\": "\\\\",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
}


def _jackson_escape(s: str) -> str:
    """Escape a JSON string the way Jackson (Spark's to_json) does:
    standard shortcuts, uppercase \\u00XX for other control chars, everything
    else (incl. non-ASCII and 0x7F) raw."""
    out = []
    for ch in s:
        if ch in _JSON_SHORTCUTS:
            out.append(_JSON_SHORTCUTS[ch])
        elif ord(ch) < 0x20:
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def _spark_str(v) -> str:
    """Stringify a Python value the way Spark's CAST(x AS STRING) does."""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v == int(v) and abs(v) < 1e16:
        return f"{v:.1f}"  # Spark/Java prints 350000.0, same as Python str()
    return str(v)


def stamp_metadata(
    df: DataFrame,
    extra_exclude: set[str] | None = None,
    scraped_at=None,
) -> DataFrame:
    """Add the engine metadata columns ``scraped_at`` + ``row_hash``.

    Mirrors reference src/engine/database.py:135-137 (every written row
    carries both). ``scraped_at`` may be pinned (batch timestamp) or defaults
    to ``current_timestamp()``.
    """
    ts = F.lit(scraped_at).cast("timestamp") if scraped_at is not None else F.current_timestamp()
    data_cols = [c for c in df.columns if c not in ("scraped_at", "row_hash")]
    return df.select(*data_cols).withColumns(
        {
            "scraped_at": ts,
            "row_hash": row_hash_col(data_cols, extra_exclude),
        }
    )


def md5_uuid_format(md5_hex: Column) -> Column:
    """Format a 32-char MD5 hex string as 8-4-4-4-12 UUID text."""
    return F.concat_ws(
        "-",
        F.substring(md5_hex, 1, 8),
        F.substring(md5_hex, 9, 4),
        F.substring(md5_hex, 13, 4),
        F.substring(md5_hex, 17, 4),
        F.substring(md5_hex, 21, 12),
    )


def entity_uuid_col(entry_id: Column | str, columns: Iterable[str]) -> Column:
    """Deterministic entity UUID from entry id + canonical JSON of fields.

    Reference recipe (scrapers/vgsi/source.py:182-194):
    ``MD5(f"{pid}{json.dumps(data, sort_keys=True, default=str)}")`` formatted
    as a UUID — dict-order independent. Spark restatement: md5 over
    entry-id string-concat canonical sorted-struct JSON.
    """
    entry = F.col(entry_id) if isinstance(entry_id, str) else entry_id
    fields = sorted(columns)
    payload = F.to_json(
        F.struct(*[F.col(c).cast("string").alias(c) for c in fields])
    )
    return md5_uuid_format(F.md5(F.concat(entry.cast("string"), payload)))


def hash64(c: Column | str, seed: int | str = "") -> Column:
    """Deterministic unsigned-ish 60-bit integer hash, cross-engine portable.

    Defined as the first 15 hex chars of ``md5(seed || value)`` parsed base-16.
    The same value is computable in DuckDB as
    ``('0x' || substring(md5(seed || v), 1, 15))::BIGINT`` — this is the
    primitive the dedup/similarity operators build their oracle-checkable
    signatures on.
    """
    col = F.col(c) if isinstance(c, str) else c
    payload = F.concat(F.lit(str(seed)), col.cast("string"))
    return F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("long")


def hash64_py(value: str, seed: int | str = "") -> int:
    """Driver-side twin of :func:`hash64` — the SAME md5-prefix rule,
    computed in Python. Probes that fold a literal key into a partition
    filter (e.g. the BM25 term-bucket prune) MUST use this instead of
    re-implementing the rule, or filter/layout drift silently excludes
    the true buckets."""
    import hashlib

    h = hashlib.md5((str(seed) + str(value)).encode("utf-8")).hexdigest()
    return int(h[:15], 16)
