"""Loaders for the driver's synthetic tables (TESTDATA.md).

One parquet file per table at ``<sf_dir>/<name>.parquet``. The ``events``
table's ``ts`` physical type has varied across driver testdata generations
(TIMESTAMP(NANOS), TIMESTAMP(MICROS) with/without UTC adjustment), so the
loader normalizes from whatever Spark reads — long (via
``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP, or TIMESTAMP_NTZ — to
the same two columns every query builds on: the raw epoch-nanosecond long
(``ts_ns``, exact; wall-clock treated as UTC, matching DuckDB ``epoch_ns``)
and a microsecond-truncated timestamp (``ts``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "timestamp_ntz":
            # wall-clock-as-UTC, independent of the session timezone —
            # exactly DuckDB's epoch_ns() on a naive TIMESTAMP
            ns = F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ) * F.lit(1000)
        elif ts_type == "timestamp":
            ns = F.unix_micros(F.col("ts")) * F.lit(1000)
        else:  # bigint: TIMESTAMP(NANOS) file read via nanosAsLong
            ns = F.col("ts")
        # withColumn-in-place keeps ts's ordinal, so the schema is identical
        # across physical source types
        df = df.withColumn("ts", ns.cast("long")).withColumnsRenamed({"ts": "ts_ns"})
        # integer div: double division would lose precision above 2^53 ns
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts_ns div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str, names=None) -> None:
    for name in names or TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def parallelize_scan(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Repartition ONLY when the source can't parallelize itself.

    The driver's testdata files are single-row-group (unsplittable): their
    scans run as one task, so CPU-heavy downstream expressions need an
    explicit repartition. Real multi-file layouts already split — there the
    same repartition would be a pure-cost shuffle, so skip it.
    """
    cores = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) >= max(2, cores // 4):
        return df
    return df.repartition(cores)
