"""load_table must normalize events.ts from every physical shape the driver's
testdata generator has produced across rounds.

Round 3 was lost to exactly this: the generator switched events.ts from
parquet TIMESTAMP(NANOS) to TIMESTAMP(MICROS, isAdjustedToUTC=false)
(read by Spark 4 as TIMESTAMP_NTZ) and every events-backed query failed at
analysis. These fixtures pin all three shapes.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ctcityscraper_spark.plans.tables import load_table

# wall-clock instants, exact at microsecond resolution
_US = [1704067200_000_000, 1704067201_500_000, 1704070800_123_456]


def _write_events(dirpath, ts_type) -> str:
    """Write a 3-row events table whose ts column has the given arrow type."""
    if ts_type == "ns":
        ts = pa.array([u * 1000 for u in _US], type=pa.timestamp("ns"))
    elif ts_type == "us_ntz":
        ts = pa.array(_US, type=pa.timestamp("us"))
    elif ts_type == "us_utc":
        ts = pa.array(_US, type=pa.timestamp("us", tz="UTC"))
    else:  # pragma: no cover
        raise ValueError(ts_type)
    table = pa.table(
        {
            "event_id": pa.array([1, 2, 3], type=pa.int64()),
            "ts": ts,
            "user_id": pa.array([10, 20, 30], type=pa.int64()),
            "event_type": pa.array(["a", "b", "c"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    pq.write_table(table, f"{dirpath}/events.parquet")
    return str(dirpath)


@pytest.mark.parametrize("shape", ["ns", "us_ntz", "us_utc"])
def test_load_table_normalizes_every_ts_shape(spark, tmp_path, shape):
    sf_dir = _write_events(tmp_path, shape)
    df = load_table(spark, sf_dir, "events")

    # identical logical schema regardless of physical source type
    assert [f.name for f in df.schema.fields] == [
        "event_id", "ts_ns", "user_id", "event_type", "value", "props", "ts",
    ]
    assert dict(df.dtypes)["ts_ns"] == "bigint"
    assert dict(df.dtypes)["ts"] == "timestamp"

    rows = {r.event_id: r.ts_ns for r in df.select("event_id", "ts_ns").collect()}
    assert rows == {i + 1: _US[i] * 1000 for i in range(3)}


def test_ts_shapes_agree_with_duckdb_epoch_ns(spark, tmp_path):
    """ts_ns must equal DuckDB's epoch_ns(ts) — the oracle contract."""
    duckdb = pytest.importorskip("duckdb")
    for shape in ["ns", "us_ntz", "us_utc"]:
        d = tmp_path / shape
        d.mkdir()
        sf_dir = _write_events(d, shape)
        got = {
            r.event_id: r.ts_ns
            for r in load_table(spark, sf_dir, "events")
            .select("event_id", "ts_ns")
            .collect()
        }
        want = {
            eid: ns
            for eid, ns in duckdb.sql(
                "SELECT event_id, epoch_ns(ts) FROM "
                f"read_parquet('{sf_dir}/events.parquet')"
            ).fetchall()
        }
        assert got == want, shape
