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
    # Round-11 rotation (r10 VERDICT item 7: oldest-verified rows come
    # back first; reserve slots only for queries that exist at commit
    # time — _ordered below enforces that). Rotated OUT: every r10-
    # verified row except the one-green-round keepers — the seven
    # second-round-kept r9 rows (dedup_bloom_update, dedup_bloom_chase,
    # text_unigram_surprisal, ann_int8_gram_matrix,
    # text_cms_heavy_hitters, dedup_jaccard_cms_capped,
    # multimodal_frame_sample, now 2 green rounds each), the sixteen
    # subquery/engine/asof/range/window rows and the eleven standing
    # family representatives (3-9 green rounds each). All remain
    # in-repo + adversarial oracle-gated every run.
    #
    # IN — the eleven r11 additions, never driver-verified (each was
    # implemented + in-repo oracle-gated in the same commit that added
    # its name here) ...
    "text_quantile_sketch", "text_quantile_update",
    "text_quantile_by_source", "ann_pq_update", "corpus_e2e_prep",
    "dedup_prefix_filter_join", "text_quantile_drift",
    "corpus_e2e_prep_incremental", "groupby_salted_skew",
    "join_salted_skew", "dedup_incremental_prefix",
    # ... kept for a second verified round (first green row was r10):
    # the six late-r9 additions and ann_pca_ivf_recall's first
    # hash-match row ...
    "ann_gram_update", "ann_ivf_update",
    "text_kmv_distinct_shingles", "text_kmv_lang_cardinality",
    "text_kmv_update", "text_kmv_overlap", "ann_pca_ivf_recall",
    # ... oldest-verified first: last green r1 ...
    "ann_cosine_topk", "asof_join_last_purchase", "multimodal_bytes_meta",
    # ... last green r4 ...
    "dedup_drop_list", "dedup_embedding_neardup", "dedup_ngram_jaccard",
    "dedup_simhash_signatures", "dedup_winnow_pairs",
    "quality_filter_pipeline", "text_bpe_token_count",
    "text_lang_confusion", "text_winnow_fingerprints",
    # ... last green r5 ...
    "date_bucket_monthly", "except_lapsed_customers", "groupby_cube",
    "groupby_grouping_sets", "regex_extract_tokens", "string_normalize",
    "window_running_total",
    # ... last green r6 ...
    "entity_uuid_identity", "money_roundtrip", "quantiles_by_status",
    "regional_customer_revenue", "row_hash_content", "top_revenue_orders",
    "union_by_name",
    # ... last green r8 ...
    "ann_pq_adc_topk", "corpus_cut_spans", "corpus_incremental_spans",
    "events_cohort_retention", "events_funnel_ordered",
    # ... and one family representative from the 29 last-green-r9 rows
    # (an ANN recall audit) so ANN holds a fresh row
    # (scd2_changed_since, corpus_quality_deciles, dedup_simhash_pairs,
    # ann_srp_lsh_topk, ann_pq_recall and dedup_semdedup_drop_list — 4+
    # green rounds each — yield their slots to the six late-r11
    # additions; first 50 names = the window)
    "ann_ivf_recall",
]
# Verification record (matches CORRECTNESS_r01–r10): all 110 catalog
# queries at r10 HEAD hold >= 1 driver-verified green row — 104 across
# r1–r9 plus the six late-r9 additions verified in r10, where
# ann_pca_ivf_recall also got its first hash-match (its r9 row was
# rows-only). The eleven r11 additions above hold no driver row yet —
# they are first in the window precisely so this round's run records
# theirs. Names added to DRIVER_PRIORITY must exist in the catalog
# at commit time — _ordered raises on unknown names so a typo (or a
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
