"""Property-based tests (hypothesis) for the canonical expression layer.

The invariants the whole engine leans on: hash stability under column order,
null-drop sensitivity, Python-twin parity, coercion totality (never throws,
garbage -> NULL), cross-engine hash64 equality on arbitrary strings.
"""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from ctcityscraper_spark.functions import (
    compute_row_hash,
    hash64,
    money_col,
    row_hash_col,
)

# shared hypothesis config: Spark round-trips are slow -> few examples,
# no deadline, and the session-scoped `spark` fixture trips the
# function-scoped-fixture health check by design.
SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

printable = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\x00"),
    min_size=0,
    max_size=40,
)


class TestRowHashProperties:
    @settings(**SETTINGS)
    @given(a=printable, b=printable)
    def test_python_twin_matches_spark_for_strings(self, spark, a, b):
        row = {"col_a": a, "col_b": b}
        df = spark.createDataFrame([(a, b)], "col_a string, col_b string")
        spark_h = df.select(row_hash_col(["col_a", "col_b"]).alias("h")).first().h
        assert compute_row_hash(row) == spark_h

    @settings(**SETTINGS)
    @given(v=printable)
    def test_null_vs_value_always_differ(self, spark, v):
        df = spark.createDataFrame([(v, v), (v, None)], "a string, b string")
        h = [r.h for r in df.select(row_hash_col(["a", "b"]).alias("h")).collect()]
        assert h[0] != h[1]

    @settings(**SETTINGS)
    @given(v=printable)
    def test_column_order_invariant(self, spark, v):
        d1 = spark.createDataFrame([(v, "x")], "a string, b string")
        d2 = spark.createDataFrame([("x", v)], "b string, a string")
        h1 = d1.select(row_hash_col(["a", "b"]).alias("h")).first().h
        h2 = d2.select(row_hash_col(["b", "a"]).alias("h")).first().h
        assert h1 == h2


class TestHash64CrossEngine:
    @settings(**SETTINGS)
    @given(v=printable, seed=st.integers(min_value=0, max_value=99))
    def test_matches_duckdb(self, spark, v, seed):
        got = (
            spark.createDataFrame([(v,)], "v string")
            .select(hash64("v", seed=seed).alias("h"))
            .first()
            .h
        )
        (exp,) = (
            duckdb.connect()
            .execute(
                "select ('0x' || substring(md5(? || ?), 1, 15))::BIGINT",
                [str(seed), v],
            )
            .fetchone()
        )
        assert got == exp


class TestCoercionTotality:
    @settings(**SETTINGS)
    @given(raw=printable)
    def test_money_never_throws(self, spark, raw):
        out = (
            spark.createDataFrame([(raw,)], "v string")
            .select(money_col("v").alias("r"))
            .first()
            .r
        )
        assert out is None or isinstance(out, float)

    @settings(**SETTINGS)
    @given(amount=st.integers(min_value=0, max_value=10**12))
    def test_money_roundtrip_cents(self, spark, amount):
        text = f"${amount // 100:,}.{amount % 100:02d}"
        out = (
            spark.createDataFrame([(text,)], "v string")
            .select(money_col("v").alias("r"))
            .first()
            .r
        )
        assert out == pytest.approx(amount / 100.0)
