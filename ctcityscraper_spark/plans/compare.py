"""Local replica of the driver's Spark-vs-DuckDB correctness gate.

The driver runs each ``queries()[name]`` and its ``oracle_sql()[name]``
side-by-side and compares row-count + schema + order-insensitive value hash
(columns sorted by name). This module reproduces that comparison so
mismatches are caught in-repo before a round ends.
"""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb
import pandas as pd

from ctcityscraper_spark.plans.tables import TABLE_NAMES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register each testdata table as a view, like the driver does."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)  # exact shortest round-trip repr; engines must agree
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(_canon_cell(x) for x in seq) + "]"
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    ]
    return sorted(rows)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> dict:
    report: dict = {
        "row_count_match": len(spark_pdf) == len(oracle_pdf),
        "rows_spark": len(spark_pdf),
        "rows_oracle": len(oracle_pdf),
        "schema_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        "cols_spark": sorted(spark_pdf.columns),
        "cols_oracle": sorted(oracle_pdf.columns),
    }
    if not (report["row_count_match"] and report["schema_match"]):
        report["values_match"] = False
        return report
    a, b = canonicalize(spark_pdf), canonicalize(oracle_pdf)
    report["values_match"] = a == b
    if not report["values_match"]:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        report["first_diffs"] = diffs
        # distinguish float-noise from real bugs
        close = all(_rows_close(x, y) for x, y in zip(a, b))
        report["float_close_only"] = close
    return report


def _rows_close(x: tuple[str, ...], y: tuple[str, ...], rtol: float = 1e-9) -> bool:
    if len(x) != len(y):
        return False
    for a, b in zip(x, y):
        if a == b:
            continue
        try:
            fa, fb = float(a), float(b)
        except ValueError:
            return False
        if not math.isclose(fa, fb, rel_tol=rtol, abs_tol=1e-12):
            return False
    return True


def run_gate(spark, sf_dir: str, names: list[str] | None = None) -> dict[str, dict]:
    """Run every oracle-backed catalog query on both engines and compare."""
    from ctcityscraper_spark.plans.queries import QUERIES

    con = duckdb_connection(sf_dir)
    results: dict[str, dict] = {}
    for name, q in QUERIES.items():
        if q.oracle is None or (names and name not in names):
            continue
        spark_pdf = q.fn(spark, sf_dir).toPandas()
        oracle_pdf = con.execute(q.oracle).df()
        results[name] = compare_frames(spark_pdf, oracle_pdf)
    con.close()
    return results
