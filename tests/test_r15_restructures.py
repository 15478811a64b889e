"""Independent confirmation gates for the r15/r16 optimization
restructures (r15 VERDICT items 2 and 9).

The driver's rotating 50-query oracle sample left r15's four most
restructured queries outside its independent check; this module pins them
against the DuckDB oracle at sf0.01 (the driver's larger correctness SF)
on every suite run, regardless of SPARK_GRAFT_TEST_SF_DIR. It also pins
the thread-pool/registry invariant: a pooled corpus_e2e_prep run must
leave NO cached or checkpointed RDD blocks behind once the tracked
artifacts are released — i.e. every pool leg's persist/checkpoint is
registered, none leaks.
"""

from __future__ import annotations

import pytest

from ctcityscraper_spark.operators import artifacts
from ctcityscraper_spark.plans.compare import compare_frames, duckdb_connection
from ctcityscraper_spark.plans.queries import QUERIES

SF01_DIR = "/root/testdata/sf0.01"

RESTRUCTURED = [
    "corpus_e2e_prep",
    "ann_pq_retrain_cycle",
    "dedup_bloom_chase",
    "corpus_segment_dedup",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb_connection(SF01_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", RESTRUCTURED)
def test_restructured_query_matches_oracle_sf01(spark, duck01, name):
    q = QUERIES[name]
    with artifacts.scope():
        spark_pdf = q.fn(spark, SF01_DIR).toPandas()
    oracle_pdf = duck01.execute(q.oracle).df()
    report = compare_frames(spark_pdf, oracle_pdf)
    assert report["row_count_match"], report
    assert report["schema_match"], report
    assert report["values_match"], {
        k: v for k, v in report.items() if k != "first_diffs"
    } | {"first_diffs": report.get("first_diffs")}


def _storage_rdd_ids(spark) -> set[int]:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return {info.id() for info in infos}


def test_pooled_e2e_leaves_no_foreign_blocks(spark):
    """r15 VERDICT item 9: corpus_e2e_prep overlaps five legs in a driver
    thread pool whose artifacts share the registry. The audited worst case
    is a concurrently-built cache RDD id mis-attributed to another
    artifact — recomputable either way. This pins the enforceable
    invariant: after the pooled run's artifacts are released, not one
    cached or checkpointed block created by the run survives (nothing
    escaped registration)."""
    sf_dir = "/root/testdata/sf0.001"
    before = _storage_rdd_ids(spark)
    with artifacts.scope():
        out = QUERIES["corpus_e2e_prep"].fn(spark, sf_dir)
        n = out.count()
        assert n > 0
        # the pooled run did create tracked state while the scope is open
        assert _storage_rdd_ids(spark) - before
    leaked = _storage_rdd_ids(spark) - before
    assert not leaked, f"unregistered blocks leaked from the pool: {leaked}"
