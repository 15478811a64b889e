"""End-to-end test of the example property source: parse -> flatten ->
engine load/refresh -> SCD2 queries, mirroring the reference's integration
suite (tests/test_scraper.py parse tests + tests/test_engine.py e2e)."""

import json

from pyspark.sql import functions as F

from ctcityscraper_spark.engine import run_load, run_refresh
from ctcityscraper_spark.operators.scd2 import current, history
from ctcityscraper_spark.sources.contracts import ResolvedParams
from ctcityscraper_spark.sources.examples import (
    demo_page,
    entity_uuid,
    make_property_source,
    parse_property_page,
)

SOURCE = make_property_source(demo_page)


class TestParsing:
    def test_typed_coercions(self):
        p = parse_property_page(demo_page("", 7), 7)
        assert p["address"] == "7 ELM ST"
        assert p["sale_price"] == 107500.0  # "$107,500.00" money-coerced
        assert p["assessment_value"] == 207000.0
        assert p["appraisal_value"] is None  # empty -> NULL
        assert p["building_count"] == 2

    def test_unknown_spans_into_extra_fields(self):
        p = parse_property_page(demo_page("", 7), 7)
        extra = json.loads(p["extra_fields"])
        assert extra["MainContent_lblZoning"] == "R-3"

    def test_buildings_normalized(self):
        p = parse_property_page(demo_page("", 7), 7)
        b1, b2 = p["buildings"]
        assert {k: v for k, v in b1.items() if k != "sub_areas"} == {
            "bid": 1, "year_built": 1907, "living_area": 1207,
            "replacement_cost": 300000.0, "style": "Colonial",
        }
        assert b2["style"] == "Garage"

    def test_sub_areas_parsed_empty_code_skipped(self):
        p = parse_property_page(demo_page("", 7), 7)
        b1, b2 = p["buildings"]
        assert b1["sub_areas"] == [
            {"code": "FFL", "description": "First Floor",
             "gross_area": 1007.0, "living_area": 1007.0},
            {"code": "BMT", "description": "Basement",
             "gross_area": 900.0, "living_area": 0.0},
        ]  # third row has an empty code -> skipped (reference :446-447)
        assert b1["sub_areas"][0]["gross_area"] == 1007.0  # "1,007" comma-coerced
        assert b2["sub_areas"] == [
            {"code": "GAR", "description": "Garage Bay",
             "gross_area": 400.0, "living_area": None},
        ]

    def test_flatten_three_tables_fk_two_levels(self):
        from ctcityscraper_spark.sources.examples import flatten_property

        p = parse_property_page(demo_page("", 7), 7)
        tables = flatten_property([p])
        assert set(tables) == {"properties", "buildings", "sub_areas"}
        uuid = tables["properties"][0]["uuid"]
        assert all(b["property_uuid"] == uuid for b in tables["buildings"])
        assert all(s["property_uuid"] == uuid and s["pid"] == 7 for s in tables["sub_areas"])
        # grandchild keyed to its building
        assert [(s["bid"], s["code"]) for s in tables["sub_areas"]] == [
            (1, "FFL"), (1, "BMT"), (2, "GAR"),
        ]
        # nested list never leaks into the buildings table
        assert all("sub_areas" not in b for b in tables["buildings"])

    def test_uuid_dict_order_independent(self):
        d1 = {"a": 1, "b": "x"}
        d2 = {"b": "x", "a": 1}
        assert entity_uuid(5, d1) == entity_uuid(5, d2)


class TestEndToEnd:
    def test_load_refresh_scd2(self, spark, tmp_store):
        params = ResolvedParams("demo", entry_ids=list(range(1, 6)) + [950])
        stats = run_load(spark, tmp_store, SOURCE, params,
                         checkpoint_every=None, retry_delay=0)
        assert stats.scraped == 5 and stats.invalid == 1
        props = tmp_store.scan("properties")
        assert props.count() == 5
        assert tmp_store.scan("buildings").count() == 10
        subs = tmp_store.scan("sub_areas")
        assert subs.count() == 15  # 2 + 1 per property
        # three-way join resolves through both FK levels
        joined = (
            props.select(F.col("uuid").alias("property_uuid"), "address")
            .join(tmp_store.scan("buildings").select("property_uuid", "bid", "style"),
                  "property_uuid")
            .join(subs.select("property_uuid", "bid", "code"), ["property_uuid", "bid"])
        )
        assert joined.count() == 15
        garage = joined.filter(F.col("style") == "Garage").select("code").distinct()
        assert [r.code for r in garage.collect()] == ["GAR"]
        # typed columns survived spark inference
        assert dict(props.dtypes)["sale_price"] == "double"
        # extra_fields round-trips as JSON
        z = (props.filter(F.col("pid") == 3)
             .select(F.get_json_object("extra_fields", "$.MainContent_lblZoning").alias("z"))
             .first().z)
        assert z == "R-3"

        # refresh over stable pages writes nothing
        stats2 = run_refresh(spark, tmp_store, SOURCE,
                             ResolvedParams("demo", refresh=True), retry_delay=0)
        assert stats2.rows_written == 0

        # a changed page becomes a new version; note content change changes
        # the uuid (identity = content hash in this source), so the changed
        # row is a NEW entity — current() grows by one
        def changed_page(base_url, pid):
            html = demo_page(base_url, pid)
            return html.replace("OWNER 2", "NEW OWNER") if pid == 2 else html

        changed_src = make_property_source(changed_page)
        stats3 = run_refresh(spark, tmp_store, changed_src,
                             ResolvedParams("demo", refresh=True), retry_delay=0)
        # 1 property row + its 2 buildings + 3 sub_areas re-keyed to the new uuid
        assert stats3.rows_written == 6
        assert current(tmp_store.scan("properties")).count() == 6
        h = history(tmp_store.scan("properties"))
        assert h.count() == 6  # each uuid has exactly one version


class TestFlattenUdtf:
    """SQL surface for the X2 flatten contract: LATERAL UDTF fan-out."""

    def test_lateral_flatten_matches_python(self, spark):
        from ctcityscraper_spark.sources.examples import parse_property_page, flatten_property
        from ctcityscraper_spark.sources.flatten_udtf import make_flatten_udtf

        payloads = [parse_property_page(demo_page("", pid), pid) for pid in (1, 2)]
        df = spark.createDataFrame(
            [(json.dumps(p, default=str),) for p in payloads], "payload_json string"
        )
        df.createOrReplaceTempView("scraped")
        spark.udtf.register("flatten_rows", make_flatten_udtf(flatten_property))
        got = spark.sql(
            """
            SELECT f.table_name, f.row_json
            FROM scraped, LATERAL flatten_rows(payload_json) f
            """
        ).collect()
        by_table = {}
        for r in got:
            by_table.setdefault(r.table_name, []).append(json.loads(r.row_json))
        # python twin over the same payloads (flatten dedups per CALL; the
        # UDTF flattens row-at-a-time, so compare per-payload results)
        expect = {}
        for p in payloads:
            for t, rows in flatten_property([p]).items():
                expect.setdefault(t, []).extend(rows)
        assert set(by_table) == {"properties", "buildings", "sub_areas"}
        for t in expect:
            a = sorted(json.dumps(r, sort_keys=True, default=str) for r in by_table[t])
            b = sorted(json.dumps(r, sort_keys=True, default=str) for r in expect[t])
            assert a == b, t
        # FK stamping survived the SQL path: every building row carries its
        # parent uuid
        prop_uuids = {r["uuid"] for r in by_table["properties"]}
        assert all(b["property_uuid"] in prop_uuids for b in by_table["buildings"])
