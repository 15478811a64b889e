"""AS-OF join — match each left row to the most recent right row.

Spark has no native as-of join (pandas has merge_asof; the use cases are
"state at event time": enrich each event with the latest dimension version,
trade with the prevailing quote, click with the last purchase).

Implementation is the union trick — one window pass, no range explosion:

1. tag right rows (priority 0) and left rows (priority 1),
2. union on (key, ts, priority),
3. ``last(right_cols, ignorenulls=True)`` over
   ``partitionBy(key).orderBy(ts, priority).rowsBetween(unboundedPreceding,
   current)`` carries the most recent right values forward onto each left
   row (priority makes a right row at the same ts visible to that left row),
4. keep left rows.

Cost: one shuffle on the key — same as any window; never a cross or range
join. Tolerance unbounded by default; ``max_lookback_sec`` nulls out stale
matches (timestamp ``ts`` columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
    max_lookback_sec: float | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` and the same ``on`` key (NULLs when none).

    Returns all left columns plus ``<right_col><suffix>`` columns and
    ``<ts><suffix>`` (the matched right row's timestamp).

    Ties among right rows at the same (key, ts) resolve deterministically
    to the LAST row in the right frame's row order (monotonic id
    tie-break). A left row with NULL ``ts`` has no as-of instant and
    carries NULLs (it sorts before every timestamped right row — Spark's
    ASC NULLS FIRST default, which the SQL oracle pins explicitly since
    DuckDB defaults to NULLS LAST and would hand such rows the FINAL
    right match instead). Raises ValueError if the left frame already contains a
    carry-named column (e.g. chaining asof_joins with the same suffix) —
    pass a different ``suffix`` instead of silently duplicating names.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    carry = [f"{c}{suffix}" for c in right_cols] + [f"{ts}{suffix}"]
    if len(set(carry)) != len(carry):
        raise ValueError(f"asof_join: duplicate carry names {carry}; adjust suffix")
    reserved = set(carry) | {"_prio", "_rid"} | {f"_f_{c}" for c in carry}
    clash = sorted(reserved & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join: left columns {clash} collide with carry/internal names; "
            f"rename them or pass a different suffix"
        )

    r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("_prio"),
        F.monotonically_increasing_id().alias("_rid"),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(ts).alias(f"{ts}{suffix}"),
    )
    left_cols = left.columns
    l = left.select(
        "*",
        F.lit(1).alias("_prio"),
        F.lit(None).cast("long").alias("_rid"),
        *[F.lit(None).cast(r.schema[c].dataType).alias(c) for c in carry],
    )
    unioned = r.unionByName(l, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_prio"), F.col("_rid").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}") for c in carry],
    )
    out = carried.filter(F.col("_prio") == 1).select(
        *left_cols, *[F.col(f"_f_{c}").alias(c) for c in carry]
    )
    if max_lookback_sec is not None:
        rts = F.col(f"{ts}{suffix}")
        stale = rts.isNull() | (
            F.unix_timestamp(F.col(ts)) - F.unix_timestamp(rts) > max_lookback_sec
        )
        out = out.select(
            *left_cols,
            *[F.when(stale, F.lit(None)).otherwise(F.col(c)).alias(c) for c in carry],
        )
    return out
