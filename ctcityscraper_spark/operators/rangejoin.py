"""Bucketized range (interval) join — point-in-interval without an equi key.

Spark plans a naked range predicate (``p.ts >= i.start AND p.ts < i.end``)
as a BroadcastNestedLoopJoin: O(|points| * |intervals|) comparisons, the
same scale-killer class as a cartesian. The scale path is the standard
interval-bucketing decomposition (the technique behind Databricks' range
join hints and interval trees in streaming engines):

1. every interval explodes into the fixed-width integer buckets it
   overlaps: ``floor(start/w) .. floor((end-1)/w)``;
2. every point maps to its single bucket ``floor(ts/w)``;
3. join is a plain hash equi-join on bucket, then the exact range
   predicate filters within the bucket.

Cost: O(|points| + sum(interval_width)/w) join input rows and ONE hash
shuffle — each (point, interval) match meets in exactly one bucket (the
point's), so no duplicate pairs and no post-dedup. Pick ``bucket_width``
near the median interval length: wider wastes in-bucket filtering,
narrower multiplies interval replication.

The reference has no interval join (its joins are hash-equality only,
SURVEY §2.3); this is part of the engine's large-scale analytics
extension family alongside the as-of join (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUCKET = "_range_bucket"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join points to every half-open interval [start, end) containing
    them, with no equi key required.

    ``point_col``/``start_col``/``end_col`` must be non-negative
    integer-typed (epoch micros/nanos, sequence numbers...): bucketing uses
    integer ``div`` — NOT ``floor(x / w)``, whose double division loses
    ulps above 2^53 and mis-buckets epoch-nanosecond values. Overlapping
    intervals are fine — a point matches each interval it falls in,
    exactly once. Empty intervals (end <= start) match nothing.
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    clash = (set(points.columns) & set(intervals.columns)) | (
        {BUCKET} & set(points.columns) | {BUCKET} & set(intervals.columns)
    )
    if clash:
        raise ValueError(f"column name collision between sides: {sorted(clash)}")
    p = points.withColumn(BUCKET, F.expr(f"`{point_col}` div {bucket_width}"))
    iv = (
        # drop empties FIRST: sequence(a, b) runs descending when b < a
        intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
            BUCKET,
            F.explode(
                F.sequence(
                    F.expr(f"`{start_col}` div {bucket_width}"),
                    F.expr(f"(`{end_col}` - 1) div {bucket_width}"),
                )
            ),
        )
    )
    return (
        p.join(iv, BUCKET)
        .filter((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop(BUCKET)
    )
