"""Fixed-point Lloyd's k-means and the cluster-driven curation family:
mergeable/incremental Lloyd state, cluster-balanced sampling, and D4
prototype pruning (exact and sketch-threshold variants).

The IVF family (operators/similarity.py) already clusters with
``pyspark.ml`` k-means, but those centroids are float means whose
shuffle-order-dependent summation cannot be reproduced bit-for-bit by an
external engine — so the oracle gate there checks only the downstream
exact-reranked top-k, never the fitted state itself. This module is the
determinism-first sibling: embeddings are quantized to integer micros
(``floor(x * 1e6)`` — floor is exact on doubles, no transcendental), the
L2 distances and centroid updates stay in int64 arithmetic (sums of
longs are order-independent; the centroid mean is a truncating integer
division, identical semantics in Spark ``DIV`` and DuckDB ``//``), and
the hash-picked initialization reuses the cross-engine ``hash64``
primitive. The FITTED CENTROIDS are therefore themselves
oracle-checkable: DuckDB can replay every Lloyd iteration and match the
k x d centroid table bit-for-bit (plans/queries_ext.py
``ann_kmeans_centroids``).

Quantization error is bounded by 1e-6 per dimension — three orders of
magnitude below the float32 embedding noise floor — so the clustering
quality is indistinguishable from the float fit; what it buys is a
cluster assignment that an independent engine, a restarted job, or a
re-partitioned 1000-executor run reproduces EXACTLY, which is what a
curation pipeline needs when cluster ids feed downstream sampling
decisions that must be auditable.

100 TB shapes:

- ``kmeans_fit_micros``: per iteration one corpus scan + one k-row
  groupBy (map-side partial aggregation of d+1 longs per cluster — the
  classic mergeable-state Lloyd step), collecting exactly k x (d+1)
  integers to the driver. Iterations are driver-coordinated but each
  moves only kilobytes; the corpus is persisted once across iterations.
- ``assign_clusters``: the argmin over k centroid literals is ONE
  single-parse scan-stage expression (the pq_encode_expr py4j lesson) —
  zero shuffle, zero Python.
- ``cluster_balanced_sample``: a per-cluster window with a LITERAL
  ``rank <= per_cluster`` filter, which Catalyst's InferWindowGroupLimit
  turns into partial-group-limit → exchange → final — each input
  partition forwards at most ``per_cluster`` rows per cluster before
  the shuffle, so k ~ 8 window partitions never see the corpus
  (plan-asserted). ``prototype_prune``'s quota is a COLUMN (fraction of
  the cluster), which that rule cannot take, hence its hand-rolled
  two-phase ranking — and its sketch-threshold sibling for real scale.

The reference engine (carlospreising/ctcityscraper) has no clustering —
this module serves the training-data-curation extension surface
(cluster-balanced corpus subsampling, SemDeDup-style per-cluster work).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ctcityscraper_spark.functions.hashing import hash64
from ctcityscraper_spark.operators.artifacts import persist_tracked
from ctcityscraper_spark.operators.similarity import valid_vectors

MICROS = 1_000_000


def _int_array_lit_sql(values: list) -> str:
    """SQL bigint-array literal: ``array(15L, -3L, ...)``."""
    return "array(" + ", ".join(f"{int(v)}L" for v in values) + ")"


def quantize_micros_col(vec) -> F.Column:
    """``array<float> -> array<bigint>`` fixed-point quantization:
    ``floor(x * 1e6)`` per element. float32 -> float64 widening is exact,
    the multiply is one deterministic IEEE op, floor is exact — DuckDB's
    ``list_transform(v, x -> CAST(floor(x::DOUBLE * 1000000.0) AS
    BIGINT))`` reproduces it bit-for-bit."""
    col = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        col, lambda x: F.floor(x.cast("double") * F.lit(1000000.0)).cast("long")
    )


def l2int_best_expr(vm_sql: str, centroids: list) -> F.Column:
    """The ``(d, list_id)`` struct of the nearest centroid under integer
    L2, as ONE ``F.expr`` over a named ``array<bigint>`` column.

    Distances are int64 folds against centroid literals — order-exact in
    any engine (integer addition is associative); ties break on the
    lower ``list_id`` via the struct sort, mirroring DuckDB's
    ``ROW_NUMBER() OVER (ORDER BY d, list_id)``. Magnitude: unit-norm
    embeddings quantize to |v| <= 1e6, so a squared diff is <= 4e12 and
    a 64-dim sum <= 2.6e14 — five orders below int64 overflow.

    Magnitude CONTRACT (r13 ADVICE): that no-overflow bound is a
    property of roughly-unit-norm inputs, not of the fold — callers
    feeding unnormalized vectors can push ``sum((x-c)^2)`` past int64.
    At 64 dims the fold stays in-range while |micros| <= ~1.9e8 per
    element (64 * (2M)^2 <= 2^63 - 1), i.e. |x| <= ~190 — two orders
    of headroom over unit norm. It is deliberately NOT clamp-enforced
    per row (a scan-side clamp would tax every 100 TB assignment pass
    for an out-of-contract caller bug); instead both engines are
    relied on to fail loudly — Spark runs under ANSI mode (the Spark 4
    default; session.py never disables it) so int64 overflow RAISES
    rather than wrapping, and DuckDB raises natively. Out-of-contract
    magnitudes therefore produce an overflow error, never a silent
    wrong centroid or a confusing Spark-vs-oracle divergence.
    """
    # r15 optimization-round tree shape: the centroid table rides as ONE
    # constant-folded nested array literal and the k distance structs
    # come from transform(sequence(...)) instead of k separately-parsed
    # aggregate subtrees. Same zip_with lambda, same left fold, same
    # struct-sort tie-break — value-identical (oracle-gated; sum-of-
    # distances and sum-of-labels re-checked equal on the embeddings
    # fixture) with k× fewer lambda subtrees for the driver to analyze;
    # per-iteration Lloyd re-planning (fresh literals each iteration) is
    # serial driver work, the §7.3 planning bottleneck.
    cb = "array(" + ", ".join(_int_array_lit_sql(c) for c in centroids) + ")"
    return F.expr(
        f"array_sort(transform(sequence(0, {len(centroids) - 1}), i -> "
        "named_struct('d', aggregate(zip_with("
        f"{vm_sql}, element_at({cb}, i + 1), (x, c) -> (x - c) * (x - c)),"
        " 0L, (acc, x) -> acc + x), 'list_id', i)))"
    )[0]


def l2int_argmin_expr(vm_sql: str, centroids: list) -> F.Column:
    """``list_id`` of the nearest centroid — see :func:`l2int_best_expr`."""
    return l2int_best_expr(vm_sql, centroids)["list_id"]


def _tdiv(s: int, n: int) -> int:
    """Truncate-toward-zero integer division — the semantics Spark ``DIV``
    and DuckDB ``//`` share (both give -7/2 -> -3); Python ``//`` floors,
    hence the sign fold."""
    q = abs(int(s)) // int(n)
    return -q if s < 0 else q


def hash_init_centroids_micros(
    corpus: DataFrame,
    n_clusters: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "kmctr",
) -> list:
    """Deterministic init: the ``n_clusters`` valid vectors with the
    smallest ``(hash64(id, seed), id)``, quantized to micros — the
    integer twin of similarity.hash_pick_centroids. Bounded: a
    distributed TakeOrderedAndProject of exactly ``n_clusters`` rows."""
    rows = (
        valid_vectors(corpus, vec)
        .select(F.col(id_col).alias("vid"), quantize_micros_col(vec).alias("vm"))
        .orderBy(hash64(F.col("vid"), seed), "vid")
        .limit(n_clusters)
        .collect()
    )
    return [list(r.vm) for r in rows]


def kmeans_partial_state(
    corpus: DataFrame,
    centroids: list,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """The mergeable Lloyd state of ``corpus`` under FROZEN centroids:
    ``(list_id, n, s0..s{d-1})`` — per-cluster count plus d per-dimension
    long sums, one map-side-partial groupBy. SUM-mergeable across
    batches/epochs (long addition is associative and order-free), which
    is what makes the incremental update exact: state(base) + state
    (delta) == state(base ∪ delta) bit-for-bit, the delta-zone recipe's
    contract."""
    return _state_from_vm(
        valid_vectors(corpus, vec).select(quantize_micros_col(vec).alias("vm")),
        centroids,
    )


def _state_from_vm(vm_df: DataFrame, centroids: list) -> DataFrame:
    """Lloyd state over an already-quantized ``vm`` column."""
    dims = len(centroids[0])
    return (
        vm_df.select(l2int_argmin_expr("vm", centroids).alias("list_id"), "vm")
        .groupBy("list_id")
        .agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.element_at("vm", d + 1)).alias(f"s{d}")
                for d in range(dims)
            ],
        )
    )


def sum_kmeans_state(state: DataFrame) -> DataFrame:
    """SUM-collapse a Lloyd state table that may hold several delta rows
    per list (per-batch zone rows) into one row per list — exact (long
    sums), idempotent on an already-collapsed table."""
    dims = len([c for c in state.columns if c.startswith("s")])
    return state.groupBy("list_id").agg(
        F.sum("n").alias("n"),
        *[F.sum(f"s{d}").alias(f"s{d}") for d in range(dims)],
    )


def merge_kmeans_states(a: DataFrame, b: DataFrame) -> DataFrame:
    """SUM-merge two Lloyd state tables (exact, commutative)."""
    return sum_kmeans_state(a.unionByName(b))


def centroids_from_state(state: DataFrame, prev_centroids: list) -> list:
    """One Lloyd update from a state table: ``sum DIV n`` per dimension
    (truncating division — clustering module header); clusters with no
    captured vectors keep their previous centroid. Collects exactly
    <= k rows of d+1 longs."""
    dims = len(prev_centroids[0]) if prev_centroids else 0
    by_list = {r["list_id"]: r for r in state.collect()}
    return [
        [_tdiv(by_list[i][f"s{d}"], by_list[i]["n"]) for d in range(dims)]
        if i in by_list and by_list[i]["n"] > 0
        else prev_centroids[i]
        for i in range(len(prev_centroids))
    ]


def kmeans_fit_micros(
    corpus: DataFrame,
    n_clusters: int,
    iters: int = 2,
    vec: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "kmctr",
) -> list:
    """Lloyd's k-means in exact integer arithmetic; returns the fitted
    centroids as a list of ``n_clusters`` micro-int arrays (``[]`` on an
    empty/all-invalid corpus; fewer than ``n_clusters`` entries when the
    corpus holds fewer valid vectors).

    Per iteration: assign every vector to its argmin centroid (scan-stage
    literal expression), aggregate the mergeable Lloyd state
    (:func:`kmeans_partial_state`), collect k rows, and update each
    centroid to ``sum DIV n`` (truncating division). A cluster that
    captured no vectors keeps its previous centroid — the same rule the
    SQL oracle applies, so empty clusters stay bit-aligned too.
    """
    centroids = hash_init_centroids_micros(corpus, n_clusters, vec, id_col, seed)
    if not centroids or iters <= 0:
        return centroids
    v = persist_tracked(
        valid_vectors(corpus, vec).select(
            F.col(id_col).alias("vid"), quantize_micros_col(vec).alias("vm")
        )
    )
    for _ in range(iters):
        centroids = centroids_from_state(
            _state_from_vm(v.select("vm"), centroids), centroids
        )
    return centroids


def assign_clusters(
    corpus: DataFrame,
    centroids: list,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id_col, list_id)`` for every valid vector under fixed centroid
    literals — one scan-stage expression, no shuffle, no Python."""
    return (
        valid_vectors(corpus, vec)
        .select(F.col(id_col), quantize_micros_col(vec).alias("vm"))
        .select(id_col, l2int_argmin_expr("vm", centroids).alias("list_id"))
    )


def assign_with_distance(
    corpus: DataFrame,
    centroids: list,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id_col, list_id, d2)`` — nearest centroid plus the exact integer
    squared distance (micros^2) to it, still one scan-stage expression
    (the argmin struct sort already computes every distance; this just
    keeps ``d`` instead of discarding it)."""
    vm = (
        valid_vectors(corpus, vec)
        .select(F.col(id_col), quantize_micros_col(vec).alias("vm"))
    )
    best = l2int_best_expr("vm", centroids)
    return vm.select(
        id_col,
        best["list_id"].alias("list_id"),
        best["d"].alias("d2"),
    )


def prototype_prune(
    corpus: DataFrame,
    centroids: list,
    drop_pct: int = 20,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """D4-style prototype pruning (Tirumala et al. 2023: SemDeDup removes
    near-duplicates, SSL-prototypes removes the most PROTOTYPICAL points
    — the ones closest to their cluster centroid, which carry the least
    marginal information): per cluster, the drop list of the
    ``floor(n_c * drop_pct / 100)`` vectors with the smallest exact
    integer squared distance to their centroid (ties to the lower id).
    Returns ``(list_id, proto_rank, id_col, d2)``.

    Distances are int64 micros^2 (exact cross-engine); the per-cluster
    quota is one truncating division of integer counts. Exact ranking is
    hand-rolled two-phase (the quota is a COLUMN, so Catalyst's
    InferWindowGroupLimit — the rule that makes cluster_balanced_sample
    a single window — cannot fire): local rank per (input-partition,
    cluster) prunes to the quota before the per-cluster rank. NOTE the
    quota is a FRACTION of the cluster, so phase 1 caps each input
    partition's contribution at K_c rather than shrinking the total by
    much; at 100 TB the production variant
    is a per-cluster d2 THRESHOLD from the mergeable quantile-sketch
    family (operators/text.quantile_sketch) applied as a scan-side
    filter — approximate at the quota boundary, zero global ranking.
    This operator is the oracle-exact reference implementation.
    """
    # referenced twice (quota aggregation + the ranked main branch): persist
    # the narrow (id, list_id, d2) frame or the second reference re-scans
    # the corpus and re-runs the argmin pass (the kmv_overlap lesson)
    a = persist_tracked(assign_with_distance(corpus, centroids, vec, id_col))
    quotas = (
        a.groupBy("list_id")
        .agg(F.count("*").alias("n_c"))
        .select(
            "list_id",
            F.expr(f"(n_c * {int(drop_pct)}) DIV 100").alias("quota"),
        )
    )
    a = a.join(F.broadcast(quotas), "list_id").withColumn(
        "_part", F.spark_partition_id()
    )
    order = [F.col("d2"), F.col(id_col)]
    local = Window.partitionBy("_part", "list_id").orderBy(*order)
    survivors = (
        a.withColumn("_lrk", F.row_number().over(local))
        .filter(F.col("_lrk") <= F.col("quota"))
        .drop("_lrk", "_part")
    )
    w = Window.partitionBy("list_id").orderBy(*order)
    return (
        survivors.withColumn("proto_rank", F.row_number().over(w))
        .filter(F.col("proto_rank") <= F.col("quota"))
        .select("list_id", "proto_rank", id_col, "d2")
    )


def prototype_prune_threshold(
    corpus: DataFrame,
    centroids: list,
    drop_pct: int = 20,
    sketch_k: int = 256,
    vec: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "ppq",
) -> DataFrame:
    """The 100 TB variant of :func:`prototype_prune` (its docstring's
    promised scale path, made concrete): the per-cluster d2 CUTOFF comes
    from the mergeable quantile-sketch family (operators/text
    .quantile_sketch_by — ≤ partitions × k × k_clusters bounded shuffle)
    and is applied as a broadcast scan-side filter — no global
    per-cluster ranking of the corpus ever happens. Returns
    ``(list_id, id_col, d2)`` for the dropped (most prototypical) rows.

    Approximation contract: the cutoff is the sketch's ``drop_pct``-th
    percentile (rank ``ceil(p·n/100)`` among the sketch's sample), and
    the filter keeps ALL rows at or below it — so the drop count per
    cluster is ``ceil`` rather than the exact variant's ``floor`` quota,
    plus sketch resolution error when ``sketch_k`` < cluster size, plus
    every boundary tie. With ``sketch_k >= cluster size`` and distinct
    d2 values the drop set is exactly the ``ceil(p·n/100)`` closest rows
    per cluster — a superset-by-at-most-one of the exact prune (pinned
    in tests). At fraction-sized quotas this trade is the right one: the
    exact variant's output-sized ranking is the thing that doesn't scale.

    Exactness bound (r13 ADVICE): quantile_sketch_by routes the int64
    ``d2`` values through a double-typed sketch, exact only below 2^53
    — a TIGHTER bound than the fold's int64 range (at 64 dims:
    d2 < 2^53 needs |micros| <= ~5.9e6 per element, ~6x unit norm,
    vs ~1.9e8 for the fold — see :func:`l2int_best_expr`). A vector in
    the gap would compute d2 fine but could silently round the cutoff,
    so the sketch input carries a lazy ``d2 < 2^53`` assert (one
    integer comparison per row on the already-persisted narrow frame):
    out-of-bound magnitudes raise with the contract named instead of
    rounding the quantile.
    """
    a = persist_tracked(assign_with_distance(corpus, centroids, vec, id_col))
    from ctcityscraper_spark.operators.text import (
        quantile_estimate_by,
        quantile_sketch_by,
    )

    guarded = a.withColumn(
        "d2",
        F.coalesce(
            F.when(F.col("d2") < F.lit(1 << 53), F.col("d2")),
            F.assert_true(
                F.lit(False),
                F.lit(
                    "prototype_prune_threshold: d2 >= 2^53 — embedding "
                    "magnitude out of the |micros| <= ~5.9e6 contract; "
                    "the double-typed quantile sketch would round"
                ),
            ).cast("long"),
        ),
    )
    sk = quantile_sketch_by(
        guarded, keys=["list_id"], value_col="d2", id_col=id_col,
        k=sketch_k, seed=seed,
    )
    thr = quantile_estimate_by(sk, ["list_id"], percentiles=(drop_pct,)).select(
        "list_id", F.col("est").alias("d2_cut")
    )
    return (
        a.join(F.broadcast(thr), "list_id")
        .filter(F.col("d2") <= F.col("d2_cut"))
        .select("list_id", id_col, "d2")
    )


def cluster_sizes(
    corpus: DataFrame,
    centroids: list,
    vec: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``(list_id, n_assigned)`` over the FULL centroid grid (empty
    clusters emit ``n_assigned = 0``) — the audit row the centroid
    catalog query attaches."""
    spark = corpus.sparkSession
    grid = spark.range(len(centroids)).select(
        F.col("id").cast("int").alias("list_id")
    )
    counts = assign_clusters(corpus, centroids, vec, id_col).groupBy(
        "list_id"
    ).agg(F.count("*").alias("n_assigned"))
    return grid.join(counts, "list_id", "left").select(
        "list_id", F.coalesce("n_assigned", F.lit(0)).alias("n_assigned")
    )


def cluster_balanced_sample(
    corpus: DataFrame,
    centroids: list,
    per_cluster: int,
    vec: str = "embedding",
    id_col: str = "vec_id",
    seed: str = "kmsample",
) -> DataFrame:
    """Deterministic ``per_cluster`` vectors from every k-means cluster:
    ``(list_id, pick_rank, id_col)`` ranked by ``(hash64(id, seed), id)``
    within each cluster — the diversity-preserving subsample (uniform per
    cluster ~ density-flattening over the embedding space).

    Scale shape (module header): k ~ 8 clusters would make a naive
    per-cluster window a k-partition funnel, but the LITERAL
    ``rank <= per_cluster`` filter lets Catalyst's InferWindowGroupLimit
    plan a PARTIAL WindowGroupLimit before the exchange — each input
    partition forwards at most ``per_cluster`` rows per cluster, so the
    k post-shuffle partitions see ≤ partitions × per_cluster rows each,
    in ONE exchange (plan-asserted in tests/test_extension_plans.py; a
    hand-rolled two-phase window does the same prune with an extra
    shuffle, which is why this is a single window)."""
    a = assign_clusters(corpus, centroids, vec, id_col)
    w = Window.partitionBy("list_id").orderBy(
        hash64(F.col(id_col), seed), F.col(id_col)
    )
    return (
        a.withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= per_cluster)
        .select("list_id", "pick_rank", id_col)
    )
