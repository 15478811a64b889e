"""Multi-dimensional clustering (Z-order) for data-skipping layouts.

Parquet row-group / file skipping works off per-file min-max stats, so it
is only as good as the physical clustering: a table range-partitioned on
``x`` answers ``x BETWEEN ..`` from one file but scans every file for a
``y`` predicate. Interleaving the bits of several quantized dimensions
into one sort key (Morton / Z-order) bounds the min-max span of EVERY
participating dimension per file — multi-dimensional queries then skip
most files on any predicate combination.

Everything here is pure integer Column expressions (whole-stage codegen,
no UDFs, no stats collection at query time). Bounds are caller-provided:
at 100 TB they come from table-level stats the pipeline already tracks,
which keeps the key deterministic and incremental-append-safe (a new
batch z-sorts against the same fixed bounds — no global re-shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def zorder_col(
    dims: list[tuple[Column, float, float]],
    bits: int = 16,
) -> Column:
    """Morton key interleaving ``bits`` bits of each (col, lo, hi) dim.

    Each column is affinely scaled from [lo, hi] to the integer grid
    [0, 2^bits) (values outside the bounds clamp to the edge cells), then
    bit b of dim i lands at position b*len(dims)+i of the key. With two
    dims and bits=16 the key fits comfortably in a long.
    """
    if not dims:
        raise ValueError("zorder_col needs at least one dimension")
    if bits * len(dims) > 62:
        raise ValueError("bits * dims must fit in a signed long")
    cells = (1 << bits) - 1
    qs = []
    for c, lo, hi in dims:
        if not hi > lo:
            raise ValueError(f"invalid bounds [{lo}, {hi}]")
        scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
        qs.append(F.floor(clamped * cells).cast("long"))
    n = len(qs)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(qs):
            z = z + F.shiftright(q, b).bitwiseAND(F.lit(1)) * F.lit(
                1 << (b * n + i)
            )
    return z


def cluster_by_zorder(
    df: DataFrame,
    dims: list[tuple[Column, float, float]],
    n_files: int,
    bits: int = 16,
) -> DataFrame:
    """Range-partition + sort by the Z-order key: ready to write as
    ``n_files`` files whose min-max stats are tight in every dimension.

    One range shuffle (the same cost a linear sort-write pays); the key
    column is dropped after partitioning so the written schema is
    unchanged.
    """
    keyed = df.withColumn("_z", zorder_col(dims, bits))
    return (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
