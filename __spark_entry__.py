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
    # Round-12 rotation (r11 VERDICT item 5: oldest-verified rows come
    # back first; reserve slots only for queries that exist at commit
    # time — _ordered below enforces that).
    #
    # IN — the seven r12 additions, never driver-verified (each was
    # implemented + in-repo oracle-gated in the same commit that added
    # its name here) ...
    "ann_ivf_imbalance", "quality_classifier_score", "ann_pq_recon_drift",
    "dedup_incremental_embedding", "quality_classifier_eval",
    "text_cms_drift", "dedup_bloom_saturation",
    # ... the full last-green-r9 cohort (28 rows — recomputed from
    # CORRECTNESS_r01–r11: every query whose newest driver row is r9),
    # back for a fresh row ...
    "ann_int8_topk", "ann_pq_recall", "ann_srp_lsh_topk",
    "ann_srp_multiprobe_topk", "approx_aggregates_check",
    "conditional_pivot_agg", "corpus_boilerplate_segments",
    "corpus_contamination", "corpus_mixture_resample", "corpus_pii_scrub",
    "corpus_quality_deciles", "corpus_repetition_signals",
    "corpus_sample_k_per_group", "corpus_shard_stats",
    "corpus_stratified_sample", "corpus_token_budget",
    "dedup_bloom_membership", "dedup_incremental_exact",
    "dedup_keep_best", "dedup_semdedup_drop_list", "dedup_simhash_pairs",
    "events_sliding_1h_30m", "events_tumbling_6h", "json_extract_props",
    "scd2_changed_since", "text_profile", "text_top_bigrams",
    "text_vocab_coverage",
    # ... the eleven r11 additions kept for a second verified round
    # (the established one-round-keeper convention; their only green
    # row is r11) — text_quantile_drift's oracle also changed this
    # round (FULL JOIN), so its re-verification is load-bearing ...
    "text_quantile_sketch", "text_quantile_update",
    "text_quantile_by_source", "ann_pq_update", "corpus_e2e_prep",
    "dedup_prefix_filter_join", "text_quantile_drift",
    "corpus_e2e_prep_incremental", "groupby_salted_skew",
    "join_salted_skew", "dedup_incremental_prefix",
    # ... and four family representatives from the 43 last-green-r10
    # rows (relational core, SCD2, events, bloom, graph, spans, sketch,
    # ANN, multimodal — also the benched headliners, so this round's
    # BENCH and CORRECTNESS cover the same plans); the other 34 r10
    # rows yield their slots and stay in-repo + adversarial
    # oracle-gated every run; first 50 names = the window
    # (ann_cosine_topk_vectorized, dedup_bloom_chase,
    # events_sessionization, text_cms_heavy_hitters and
    # corpus_substring_spans yielded their slots to the five late r12
    # additions — their families already hold multiple fresh rows via
    # the r9 cohort or the r12 additions themselves)
    "pricing_summary", "scd2_latest_state",
    "dedup_groups_connected",
    "multimodal_frame_sample",
]
# Verification record (matches CORRECTNESS_r01–r11): all 121 catalog
# queries at r11 HEAD hold >= 1 driver-verified green row — last-green
# cohorts: 28 at r9, 43 at r10, 50 at r11 (recomputed from the files).
# The seven r12 additions above hold no driver row yet — they are first
# in the window precisely so this round's run records theirs. Names
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
