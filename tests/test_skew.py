"""Salted-join / two-phase-agg equivalence with their unsalted forms."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark.functions import skew


@pytest.fixture(scope="module")
def big(spark):
    # hot key 'hub' carries 90% of rows
    rows = [{"key": "hub" if i % 10 else f"k{i}", "row_id": i, "x": float(i % 7)}
            for i in range(1000)]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def small(spark):
    keys = ["hub"] + [f"k{i}" for i in range(0, 1000, 10)]
    return spark.createDataFrame([{"key": k, "dim_val": len(k)} for k in keys])


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, big, small):
        plain = big.join(small, "key").select("key", "row_id", "x", "dim_val")
        salted = skew.salted_join(big, small, "key", "row_id", n_salts=8).select(
            "key", "row_id", "x", "dim_val"
        )
        assert _sorted(salted) == _sorted(plain)

    def test_left_join_keeps_unmatched(self, spark, big):
        small = spark.createDataFrame([{"key": "hub", "dim_val": 1}])
        out = skew.salted_join(big, small, "key", "row_id", n_salts=4, how="left")
        assert out.count() == big.count()
        assert out.filter(F.col("dim_val").isNull()).count() == big.filter(
            F.col("key") != "hub"
        ).count()


class TestTwoPhaseAgg:
    def test_matches_single_phase(self, big):
        plain = big.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"), F.sum("x").alias("total")
        )
        two = skew.two_phase_agg(
            big, "key", "row_id",
            {"n": (F.count(F.lit(1)), F.sum), "total": (F.sum("x"), F.sum)},
            n_salts=8,
        )
        a = {r["key"]: (r["n"], r["total"]) for r in plain.collect()}
        b = {r["key"]: (r["n"], r["total"]) for r in two.collect()}
        assert set(a) == set(b)
        for k in a:
            assert a[k][0] == b[k][0]
            assert a[k][1] == pytest.approx(b[k][1])
