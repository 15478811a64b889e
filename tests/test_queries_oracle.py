"""The in-repo twin of the driver's DuckDB-oracle correctness gate.

Every catalog query with an oracle must match on row count, column names,
and order-insensitive canonical values at SPARK_GRAFT_SF_DIR (default
sf0.001 for speed; run with sf0.01 before shipping a round).
"""

import os

import pytest

from ctcityscraper_spark.plans.compare import compare_frames, duckdb_connection
from ctcityscraper_spark.plans.queries import QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = [name for name, q in QUERIES.items() if q.oracle is not None]


@pytest.fixture(scope="module")
def duck(spark):
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    spark_pdf = q.fn(spark, SF_DIR).toPandas()
    oracle_pdf = duck.execute(q.oracle).df()
    report = compare_frames(spark_pdf, oracle_pdf)
    assert report["row_count_match"], report
    assert report["schema_match"], report
    assert report["values_match"], {k: v for k, v in report.items() if k != "first_diffs"} | {
        "first_diffs": report.get("first_diffs")
    }


def test_all_queries_return_rows(spark):
    for name, q in QUERIES.items():
        n = q.fn(spark, SF_DIR).count()
        assert n >= 0, name
