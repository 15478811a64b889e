"""Spark 4 Python DataSource for SODA (sources/soda_datasource.py).

Covers the reference's pagination semantics (scrapers/llc_ct_data/
source.py:57-165) expressed through the DataSource API: count-probe
partition planning, per-page executor reads, remote $where pushdown,
and the streaming offset contract (initialOffset/read/readBetweenOffsets).
The fetcher is an injected offline fake served from this module
(workers import it by name via the fetcher="module:callable" option).
"""

import re
import urllib.parse

import pytest
from pyspark.sql import functions as F

from ctcityscraper_spark.sources.soda_datasource import (
    SodaDataSource,
    soda_url,
    where_clause,
)

TOTAL = 120


def _rows(where: str | None):
    rows = [
        {"id": str(i), "name": f"biz{i}", "status": "Active" if i % 2 else "Inactive"}
        for i in range(TOTAL)
    ]
    if where:
        m = re.fullmatch(r"(\w+) = '([^']*)'", where)
        assert m, f"fake endpoint got unexpected $where: {where}"
        col, val = m.groups()
        rows = [r for r in rows if r[col] == val]
    return rows


def ds_fetch(url: str) -> list[dict]:
    qs = dict(urllib.parse.parse_qsl(urllib.parse.urlsplit(url).query))
    rows = _rows(qs.get("$where"))
    if qs.get("$select", "").startswith("count"):
        return [{"n": str(len(rows))}]
    off, lim = int(qs.get("$offset", 0)), int(qs["$limit"])
    return rows[off : off + lim]


OPTS = {
    "base_url": "http://fake.example",
    "dataset": "abcd-1234",
    "columns": "id,name,status",
    "page_size": "50",
    "fetcher": "test_soda_datasource:ds_fetch",
}


@pytest.fixture(scope="module")
def soda_spark(spark):
    spark.dataSource.register(SodaDataSource)
    # Spark refuses any reader implementing pushFilters() while this conf
    # is false (DATA_SOURCE_PUSHDOWN_DISABLED), so it is a hard requirement
    # of the format, not an optimization toggle.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def _read(spark):
    return spark.read.format("soda").options(**OPTS).load()


class TestUrlHelpers:
    def test_soda_url_encodes_params(self):
        u = soda_url("http://h", "ds", {"$limit": "5", "$where": "a = 'x y'"})
        assert u.startswith("http://h/resource/ds.json?")
        assert "%24limit=5" in u and "x%20y" in u

    def test_where_clause_escapes_quotes(self):
        assert where_clause([]) is None
        assert where_clause([("a", "o'brien"), ("b", 1)]) == "a = 'o''brien' AND b = '1'"


class TestBatchRead:
    def test_paged_scan_all_rows(self, soda_spark):
        df = _read(soda_spark)
        assert df.columns == ["id", "name", "status"]
        assert df.count() == TOTAL
        # 120 rows at page_size=50 -> 3 input partitions (reference's page plan)
        assert df.rdd.getNumPartitions() == 3
        got = {r.id for r in df.collect()}
        assert got == {str(i) for i in range(TOTAL)}

    def test_equality_filter_pushed_to_remote(self, soda_spark):
        df = _read(soda_spark).filter(F.col("status") == "Active")
        # 2 partitions (not 3) proves the count probe carried the pushed
        # $where: only the 60 matching rows were planned into pages. And
        # because a fully-pushed filter is NOT re-applied post-scan,
        # count==60 proves each page request carried it too — unfiltered
        # pages at offsets 0/50 would surface Inactive rows (count 100).
        assert df.count() == TOTAL // 2
        assert df.rdd.getNumPartitions() == 2

    def test_unpushable_filter_still_correct(self, soda_spark):
        df = _read(soda_spark).filter(F.col("id").cast("int") > 100)
        assert df.count() == 19  # Spark applies the residual post-scan

    def test_sql_surface(self, soda_spark):
        _read(soda_spark).createOrReplaceTempView("soda_live")
        n = soda_spark.sql(
            "SELECT count(*) AS n FROM soda_live WHERE status = 'Inactive'"
        ).collect()[0].n
        assert n == TOTAL // 2


class TestStreamRead:
    def test_incremental_pages_to_sink(self, soda_spark, tmp_path):
        q = (
            soda_spark.readStream.format("soda")
            .options(**OPTS)
            .load()
            .writeStream.format("memory")
            .queryName("soda_stream")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        # PythonMicroBatchStream has no availableNow support; drain by
        # running micro-batches until the source reports no new offset.
        q.processAllAvailable()
        q.stop()
        got = soda_spark.sql("SELECT id FROM soda_stream").collect()
        assert {r.id for r in got} == {str(i) for i in range(TOTAL)}

    def test_offset_contract_replayable(self):
        from ctcityscraper_spark.sources.soda_datasource import SodaStreamReader

        r = SodaStreamReader(dict(OPTS))
        assert r.initialOffset() == {"offset": 0}
        it, end = r.read({"offset": 0})
        first = list(it)
        assert len(first) == 50 and end == {"offset": 50}
        # deterministic replay of a committed range
        replay = list(r.readBetweenOffsets({"offset": 0}, {"offset": 50}))
        assert replay == first
        # drain to the end; read past the end is empty and offset is stable
        it, end = r.read({"offset": 100})
        assert len(list(it)) == 20 and end == {"offset": 120}
        it, end = r.read({"offset": 120})
        assert list(it) == [] and end == {"offset": 120}
