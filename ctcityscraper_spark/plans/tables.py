"""Loaders for the driver's synthetic tables (TESTDATA.md).

One parquet file per table at ``<sf_dir>/<name>.parquet``. The ``events``
table stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark 4 refuses to
read natively — we flip ``spark.sql.legacy.parquet.nanosAsLong`` (runtime
settable) and expose both the raw nanosecond long (``ts_ns``, exact) and a
microsecond-truncated timestamp (``ts``).
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
        # integer div: double division would lose precision above 2^53 ns
        return df.withColumnsRenamed({"ts": "ts_ns"}).withColumn(
            "ts", F.timestamp_micros(F.expr("ts_ns div 1000"))
        )
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
