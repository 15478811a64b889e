"""Arrow-path construction of small driver-local DataFrames.

``spark.createDataFrame(list_of_rows, schema)`` parallelizes PICKLED rows
across ``defaultParallelism`` partitions: every downstream action then
pays one Python-worker launch per partition to deserialize a handful of
rows (measured 1.4-2.0 s cold for a few hundred rows on local[32] —
guide §4's boundary cost in miniature). Handing the rows over as a
pandas DataFrame instead routes through Arrow
(``spark.sql.execution.arrow.pyspark.enabled`` is on in session.py): one
JVM-local relation, no Python workers on the read side.

The values must already match the declared schema (ints for integer
columns, strings for string columns) — exactly the contract the
plain-list form had; Arrow raises on a genuine mismatch instead of
silently nulling, which is the safer failure mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(
    spark: SparkSession, rows: list, columns: list[str], schema
) -> DataFrame:
    """Build a DataFrame from driver-local row tuples via the Arrow path.

    ``rows``: list of tuples in ``columns`` order. ``schema``: the exact
    Spark schema (StructType or DDL string) the plain-list form declared
    — types and nullability are preserved bit-for-bit."""
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=columns), schema
    )
