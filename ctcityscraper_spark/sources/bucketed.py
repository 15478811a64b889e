"""Bucketed-table layout: shuffle-free co-located joins for 100 TB facts.

At scale, the dominant cost of a fact-fact join (orders ⋈ lineitem,
documents ⋈ shingle-index, history ⋈ history) is the shuffle of both sides
on the join key. Spark's bucketing amortizes that shuffle to WRITE time:
``bucketBy(n, key)`` hash-partitions files on disk, and two tables bucketed
on the same key with the same bucket count sort-merge-join with ZERO
Exchange on either side — every future join of the pair is shuffle-free.

The engine's append-only history tables are natural bucketing candidates
(entity uuid is the join/window key for every SCD2 view); testdata parquet
is unbucketed, so this module is the layout tool plus a provable demo,
asserted shuffle-free in tests/test_extension_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    sort: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a bucketed (+ optionally sorted) managed table.

    ``sort`` pre-sorts within buckets so a later sort-merge join also skips
    its Sort. Bucket count should target HDFS-block-ish files at the final
    data size (e.g. 100 TB / 512 MB ≈ 200k buckets); both join sides must
    use the SAME count for co-location.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*sort)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left: str, right: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two co-bucketed tables — plans with no Exchange on either side."""
    return spark.table(left).join(spark.table(right), on, how)
