"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The catalog itself lives in ``ctcityscraper_spark.plans.queries`` — one entry
per operator shape from SURVEY.md §2 plus the LLM-pipeline extensions; this
module is a thin adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ctcityscraper_spark.plans.queries import (  # noqa: E402
    oracle_sql_catalog,
    query_catalog,
)

# The driver's correctness harness samples the FIRST 50 catalog entries, so
# ordering decides which queries get externally-verified rows each round.
# This priority prefix covers every operator family — the relational /
# SCD2 / streaming core AND one-or-more representatives of each extension
# family (MinHash/SimHash/incremental/cascade dedup, connected components,
# exact + PQ + LSH ANN, SemDeDup, substring spans, segment dedup) — within
# the 50-row window; everything else (all still verified by the in-repo
# DuckDB oracle gate, tests/test_queries_oracle.py) follows in catalog
# order. See README "Correctness verification" for the two tiers.
DRIVER_PRIORITY = [
    # Round-13 rotation (r12 VERDICT item 3: lead with the oldest-green
    # cohort; reserve slots only for queries that exist at commit time —
    # _ordered below enforces that).
    #
    # IN — the two r13 additions, never driver-verified (each was
    # implemented + in-repo oracle-gated in the same commit that added
    # its name here) ...
    "layout_zorder_cells", "ann_pq_retrain_cycle",
    # ... the two composed DAGs whose SEMANTICS changed this round (the
    # trained quality gate + n_quality_dropped column landed between the
    # contamination stage and packing — their r12 green rows verify the
    # OLD shape, so fresh rows are load-bearing) ...
    "corpus_e2e_prep", "corpus_e2e_prep_incremental",
    # ... the seven r12 additions kept for a second verified round (the
    # established one-round-keeper convention; their only green row is
    # r12) ...
    "ann_ivf_imbalance", "quality_classifier_score", "ann_pq_recon_drift",
    "dedup_incremental_embedding", "quality_classifier_eval",
    "text_cms_drift", "dedup_bloom_saturation",
    # ... and the full last-green-r10 cohort (39 rows — recomputed from
    # CORRECTNESS_r01–r12: every query whose newest driver row is r10),
    # back for a fresh row. 2 + 2 + 7 + 39 = 50 = the window exactly;
    # the 39-row last-green-r11 cohort holds the next-oldest rows and
    # leads the r14 rotation.
    "ann_cosine_topk_vectorized", "ann_int8_gram_matrix", "ann_ivf_topk",
    "ann_pq_rerank_topk", "anti_join_customers_without_orders",
    "corpus_pack_sequences", "corpus_segment_dedup",
    "corpus_substring_spans", "dedup_bloom_chase", "dedup_bloom_update",
    "dedup_cascade_confirmed", "dedup_embedding_blocked",
    "dedup_exact_summary", "dedup_incremental_lsh",
    "dedup_jaccard_cms_capped", "dedup_lsh_recall", "dedup_minhash_lsh",
    "distinct_sort", "engine_scd2_changed_since", "engine_scd2_current",
    "events_sessionization", "groupby_rollup", "join_agg_by_segment",
    "join_star_three_way", "range_join_surge_windows",
    "scan_filter_project", "scd2_as_of", "scd2_history_versions",
    "semi_join_parts_in_lineitem", "subq_exists_late_shipment",
    "subq_outer_join_order_counts", "subq_rich_inactive_customers",
    "subq_scalar_avg_quantity", "text_cms_heavy_hitters",
    "text_tfidf_top_terms", "text_unigram_surprisal",
    "timeseries_gapfill_locf", "topk_orders", "window_frame_stats",
]
# Verification record (matches CORRECTNESS_r01–r12): all 128 catalog
# queries at r12 HEAD hold >= 1 driver-verified green row — last-green
# cohorts: 39 at r10, 39 at r11, 50 at r12 (recomputed from the files).
# The two r13 additions above hold no driver row yet, and the two
# composed DAGs' r12 rows predate their quality-gate stage — all four
# are first in the window precisely so this round's run records theirs.
# dedup_prefix_filter_join / dedup_incremental_prefix changed INTERNALS
# this round (PPJoin positional filter) with output proven identical by
# the in-repo naive-join oracle gate, so their r12 rows stand. The
# late-r13 additions text_cms_saturation / dedup_bloom_rebuild /
# text_bm25_topk / hybrid_rrf_topk / ann_kmeans_centroids /
# ann_kmeans_update / corpus_cluster_balanced_sample /
# corpus_prototype_prune / corpus_dsir_importance /
# corpus_dsir_shift / corpus_dsir_bigram / corpus_dsir_incremental sit
# after the 50-row window (in-repo + adversarial gated this round)
# and lead the r14 rotation per the within-a-round-or-two policy. Names
# added to DRIVER_PRIORITY must exist in the catalog at commit time —
# _ordered raises on unknown names so a typo (or a planned-but-unbuilt
# query) cannot silently fall out of the window. Everything outside
# the window remains in-repo + adversarial oracle-gated every run.


def _ordered(catalog: dict) -> dict:
    unknown = [n for n in DRIVER_PRIORITY if n not in catalog]
    if unknown:
        raise KeyError(
            f"DRIVER_PRIORITY names not in the catalog: {unknown} — "
            "implement the query or remove the name (silent drops would "
            "falsify the driver-window verification record)"
        )
    head = {n: catalog[n] for n in DRIVER_PRIORITY}
    return head | {n: v for n, v in catalog.items() if n not in head}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    qs = query_catalog()
    return qs["pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _ordered(query_catalog())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-expressible query."""
    return _ordered(oracle_sql_catalog())
