"""SQL-surface twins of the scalar function family (functions/coercion.py,
functions/hashing.py) as Spark 4 SQL UDFs.

``CREATE OR REPLACE TEMPORARY FUNCTION ... RETURN <expr>`` declares a pure
expression function: the optimizer inlines the body at every call site, so
these stay inside whole-stage codegen exactly like their Column-builder
twins — no Python boundary, no UDF tax. A user living in ``spark.sql`` gets
the same lenient coercions the DataFrame API gets (reference semantics:
scrapers/vgsi/source.py:134-174, 421-424).

Bodies are kept textually in lockstep with the Column builders; the test
suite evaluates both paths over adversarial inputs and asserts equality.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name -> (signature, return type, body). Bodies mirror coercion.py /
# hashing.py expression-for-expression.
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "money_clean": (
        "(s STRING)",
        "DOUBLE",
        r"try_cast(nullif(regexp_replace(trim(cast(s AS STRING)), '[$,\\s]', ''), '') AS DOUBLE)",
    ),
    "float_clean": (
        "(s STRING)",
        "DOUBLE",
        "try_cast(nullif(trim(cast(s AS STRING)), '') AS DOUBLE)",
    ),
    "int_clean": (
        "(s STRING)",
        "BIGINT",
        # reference does int(float(x)): truncation toward zero
        "try_cast(try_cast(nullif(trim(cast(s AS STRING)), '') AS DOUBLE) AS BIGINT)",
    ),
    "string_clean": (
        "(s STRING)",
        "STRING",
        "nullif(trim(cast(s AS STRING)), '')",
    ),
    "comma_number": (
        "(s STRING)",
        "DOUBLE",
        "try_cast(nullif(regexp_replace(trim(cast(s AS STRING)), ',', ''), '') AS DOUBLE)",
    ),
    "normalize_key": (
        "(s STRING)",
        "STRING",
        r"regexp_replace(regexp_replace(regexp_replace("
        r"lower(trim(cast(s AS STRING))), '[\\s:]+$', ''), '&', 'and'), '\\s+', '_')",
    ),
    "hash64": (
        "(seed STRING, v STRING)",
        "BIGINT",
        # first 15 md5 hex chars base-16 — the cross-engine bucket primitive
        "cast(conv(substring(md5(concat(seed, cast(v AS STRING))), 1, 15), 16, 10) AS BIGINT)",
    ),
}


def register_sql_functions(spark: SparkSession) -> None:
    """Declare the scalar family as temporary SQL functions (idempotent)."""
    for name, (sig, ret, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig} "
            f"RETURNS {ret} RETURN {body}"
        )
