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
    # Round-14 rotation (r13 VERDICT item 3: the 12 never-driver-verified
    # late-r13 additions lead; the remaining 38 slots come from the
    # 39-row last-green-r11 cohort, oldest rows first; reserve slots only
    # for queries that exist at commit time — _ordered below enforces
    # that).
    #
    # IN — the 12 late-r13 additions, never driver-verified (each was
    # in-repo + adversarially oracle-gated in the commit that built
    # it) ...
    "dedup_bloom_rebuild", "ann_kmeans_centroids", "ann_kmeans_update",
    "corpus_cluster_balanced_sample", "corpus_prototype_prune",
    "text_cms_saturation", "text_bm25_topk", "hybrid_rrf_topk",
    "corpus_dsir_importance", "corpus_dsir_shift", "corpus_dsir_bigram",
    "corpus_dsir_incremental",
    # ... the two composed DAGs whose SEMANTICS changed this round (the
    # DSIR selection stage + n_dsir_dropped column landed between the
    # quality gate and packing — their r13 green rows verify the OLD
    # shape, so fresh rows are load-bearing; same treatment the quality
    # gate got in the r13 window) ...
    "corpus_e2e_prep", "corpus_e2e_prep_incremental",
    # ... and 36 of the 39-row last-green-r11 cohort (recomputed from
    # CORRECTNESS_r01–r13: every query whose newest driver row is r11),
    # back for a fresh row. 12 + 2 + 36 = 50 = the window exactly; the
    # three that do not fit (top_revenue_orders, union_by_name,
    # window_running_total — last alphabetically) plus any r14 additions
    # lead the r15 rotation.
    "ann_cosine_topk", "ann_gram_update", "ann_ivf_recall",
    "ann_ivf_update", "ann_pca_ivf_recall", "ann_pq_adc_topk",
    "asof_join_last_purchase", "corpus_cut_spans",
    "corpus_incremental_spans", "date_bucket_monthly", "dedup_drop_list",
    "dedup_embedding_neardup", "dedup_ngram_jaccard",
    "dedup_simhash_signatures", "dedup_winnow_pairs",
    "entity_uuid_identity", "events_cohort_retention",
    "events_funnel_ordered", "except_lapsed_customers", "groupby_cube",
    "groupby_grouping_sets", "money_roundtrip", "multimodal_bytes_meta",
    "quality_filter_pipeline", "quantiles_by_status",
    "regex_extract_tokens", "regional_customer_revenue",
    "row_hash_content", "string_normalize", "text_bpe_token_count",
    "text_kmv_distinct_shingles", "text_kmv_lang_cardinality",
    "text_kmv_overlap", "text_kmv_update", "text_lang_confusion",
    "text_winnow_fingerprints",
]
# Verification record (matches CORRECTNESS_r01–r13): at r13 HEAD all
# 130 pre-r13 catalog queries hold >= 1 driver-verified green row —
# last-green cohorts: 39 at r11, 41 at r12, 50 at r13 (recomputed from
# the files). The 12 late-r13 additions above hold no driver row yet
# and lead the window precisely so this round's run records theirs.
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
