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
    # Round-15 rotation (same policy as r13/r14: never-driver-verified
    # queries lead, then the oldest last-green cohorts, oldest first,
    # alphabetical within a cohort; reserve slots only for queries that
    # exist at commit time — _ordered below enforces that).
    #
    # IN — the 2 late-r14 additions, never driver-verified (each was
    # in-repo + adversarially oracle-gated in the commit that built
    # it), plus the 10 r15 additions (inserted as they landed) ...
    "corpus_prototype_prune_threshold", "text_bm25_incremental",
    "dedup_groups_incremental", "text_bpe_train", "text_bpe_apply",
    "text_bpe_incremental", "text_bpe_fertility", "text_bpe_retrain_cycle",
    "dedup_incremental_drop_list", "corpus_curriculum_order",
    "text_bm25_index_health", "corpus_curriculum_pack",
    # ... the 3-row last-green-r11 cohort that did not fit in the r14
    # window (promised there to lead r15) ...
    "top_revenue_orders", "union_by_name", "window_running_total",
    # ... and 35 of the 41-row last-green-r12 cohort (recomputed from
    # CORRECTNESS_r01–r14: every query whose newest driver row is r12),
    # alphabetical; the six that no longer fit (text_quantile_by_source,
    # text_quantile_drift, text_quantile_sketch, text_quantile_update,
    # text_top_bigrams, text_vocab_coverage) lead the r16 rotation ...
    "ann_int8_topk", "ann_pq_recall", "ann_pq_update",
    "ann_srp_lsh_topk", "ann_srp_multiprobe_topk",
    "approx_aggregates_check", "conditional_pivot_agg",
    "corpus_boilerplate_segments", "corpus_contamination",
    "corpus_mixture_resample", "corpus_pii_scrub",
    "corpus_quality_deciles", "corpus_repetition_signals",
    "corpus_sample_k_per_group", "corpus_shard_stats",
    "corpus_stratified_sample", "corpus_token_budget",
    "dedup_bloom_membership", "dedup_groups_connected",
    "dedup_incremental_exact", "dedup_incremental_prefix",
    "dedup_keep_best", "dedup_prefix_filter_join",
    "dedup_semdedup_drop_list", "dedup_simhash_pairs",
    "events_sliding_1h_30m", "events_tumbling_6h",
    "groupby_salted_skew", "join_salted_skew", "json_extract_props",
    "multimodal_frame_sample", "pricing_summary", "scd2_changed_since",
    "scd2_latest_state", "text_profile",
]
# Verification record (recomputed from CORRECTNESS_r01–r14 at r15 start):
# every one of the 144 r14-close catalog queries except the 2 late-r14
# additions above holds >= 1 driver-verified green row — last-green
# cohorts: 3 at r11, 41 at r12, 48 at r13, 50 at r14. The six r12
# rows that no longer fit (text_quantile_by_source,
# text_quantile_drift, text_quantile_sketch, text_quantile_update,
# text_top_bigrams, text_vocab_coverage) plus the 48-row r13 cohort
# lead the r16 rotation.
# Names added to DRIVER_PRIORITY must exist in the catalog at commit
# time — _ordered raises on unknown names so a typo (or a
# planned-but-unbuilt query) cannot silently fall out of the window.
# Everything outside the window remains in-repo + adversarial
# oracle-gated every run.


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
