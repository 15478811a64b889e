"""Skew mitigation: salting for hot keys, beyond what AQE fixes alone.

AQE's skew-join splitting (enabled in session.py) handles sort-merge join
skew at runtime. Salting is the complementary *aggregation* and
*broadcast-ineligible join* tool: spread one hot key across S sub-keys,
combine, then merge. Both helpers are pure DataFrame transforms.

At 100 TB the classic victims are power-law keys (one customer = 10% of
events). ``salted_agg`` makes the first (heavy) combine step uniform:
shuffle 1 carries (key, salt) groups of bounded size; shuffle 2 carries one
row per original key.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F


def with_salt(df: DataFrame, buckets: int, col_name: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, buckets) — non-deterministic by design;
    use only where the final result is salt-independent (associative aggs)."""
    return df.withColumn(col_name, (F.rand() * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial_aggs`` run per (key, salt); ``merge_aggs`` combine the partials
    per key. Caller guarantees the pair is a valid decomposition (sum/sum,
    count/sum, min/min, max/max...).

    Example::

        salted_agg(events, ["user_id"],
                   [F.count("*").alias("n"), F.sum("value").alias("v")],
                   [F.sum("n").alias("n"), F.sum("v").alias("v")])
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, explode the small side.

    The small side is replicated ``buckets``× (it must be the dimension-ish
    side); the hot key's rows spread over ``buckets`` tasks instead of one.
    Prefer ``broadcast()`` when the small side fits in memory — this is for
    the in-between regime (too big to broadcast, join key too skewed for a
    plain shuffle join).
    """
    salted_big = with_salt(skewed, buckets)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_big.join(exploded_small, [on, "_salt"], how)
    return out.drop("_salt")
