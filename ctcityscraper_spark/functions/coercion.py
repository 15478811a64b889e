"""Lenient type coercions, JVM-side (no Python UDFs).

Reference semantics (scrapers/vgsi/source.py:134-174, tests/test_scraper.py:24-74):

- money:  strip ``$`` / ``,`` / whitespace -> float; empty or garbage -> NULL
- float/int: lenient casts; garbage -> NULL (Spark CAST already yields NULL
  on malformed input, matching the reference's try/except-None)
- string: trim; empty -> NULL
- key normalization: header text -> lower, spaces->underscore, ``&``->``and``,
  strip trailing ``:`` (reference scrapers/vgsi/source.py:421-424, 476-479)
- comma-number: ``"2,000" -> 2000.0`` (reference :368-371, 451-457)

All are built-in expression compositions so they stay inside whole-stage
codegen and push down fine at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def money_col(c: Column | str) -> Column:
    """``"$1,500.00 " -> 1500.0``; ``"" | "N/A" -> NULL``."""
    cleaned = F.regexp_replace(F.trim(_as_col(c).cast("string")), r"[$,\s]", "")
    return F.nullif(cleaned, F.lit("")).try_cast("double")


def float_col(c: Column | str) -> Column:
    """Lenient float: garbage/empty -> NULL (Spark cast semantics)."""
    return F.nullif(F.trim(_as_col(c).cast("string")), F.lit("")).try_cast("double")


def int_col(c: Column | str) -> Column:
    """Lenient int: accepts ``"7"``/``"7.0"``; garbage -> NULL.

    The reference does ``int(float(value))`` (scrapers/vgsi/source.py:159-167),
    i.e. truncation toward zero — double-cast then long-cast matches.
    """
    return float_col(c).try_cast("long")


def clean_string_col(c: Column | str) -> Column:
    """Trim; empty -> NULL (reference _clean_string, vgsi/source.py:170-174)."""
    return F.nullif(F.trim(_as_col(c).cast("string")), F.lit(""))


def comma_number_col(c: Column | str) -> Column:
    """``"2,000" -> 2000.0`` — comma strip then lenient float."""
    return F.nullif(
        F.regexp_replace(F.trim(_as_col(c).cast("string")), ",", ""), F.lit("")
    ).try_cast("double")


def normalize_key(c: Column | str) -> Column:
    """Header text -> column-name key.

    lower(), strip trailing ``:``, ``&`` -> ``and``, whitespace -> ``_``
    (reference scrapers/vgsi/source.py:421-424).
    """
    k = F.lower(F.trim(_as_col(c).cast("string")))
    k = F.regexp_replace(k, r"[\s:]+$", "")
    k = F.regexp_replace(k, r"&", "and")
    k = F.regexp_replace(k, r"\s+", "_")
    return k
