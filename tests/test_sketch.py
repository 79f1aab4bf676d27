"""KMV distinct-count sketch: exactness below k, estimator accuracy,
lossless mergeability, and bounded sketch size."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from graphrag_toolkit_spark.operators import sketch


@pytest.fixture(scope="module")
def values(spark):
    # group 'small' has 40 distinct values (< k), 'big' has 5000 (>> k)
    small = spark.range(40).select(
        F.lit("small").alias("g"), F.concat(F.lit("s"), F.col("id")).alias("v")
    )
    big = spark.range(5000).select(
        F.lit("big").alias("g"), F.concat(F.lit("b"), F.col("id")).alias("v")
    )
    # duplicates must not change anything
    return small.unionByName(big).unionByName(small)


def test_exact_below_k(values):
    out = {
        r["g"]: r["distinct_est"]
        for r in sketch.kmv_distinct(values, ["g"], "v", k=64).collect()
    }
    assert out["small"] == 40.0


def test_estimator_accuracy(values):
    out = {
        r["g"]: r["distinct_est"]
        for r in sketch.kmv_distinct(values, ["g"], "v", k=256).collect()
    }
    # std error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(out["big"] - 5000) / 5000 < 0.25


def test_sketch_size_bounded(values):
    rows = sketch.kmv_sketch(values, ["g"], "v", k=64).collect()
    sizes = {r["g"]: len(r["kmv"]) for r in rows}
    assert sizes == {"small": 40, "big": 64}
    for r in rows:
        assert r["kmv"] == sorted(r["kmv"])


def test_merge_equals_resketch(spark, values):
    """Merging two halves' sketches gives EXACTLY the sketch of the union —
    the roll-up path loses nothing."""
    k = 64
    first = values.filter(F.col("v").rlike("[02468]$"))
    second = values.filter(F.col("v").rlike("[13579]$"))
    a = sketch.kmv_sketch(first, ["g"], "v", k).withColumnRenamed("kmv", "ka")
    b = sketch.kmv_sketch(second, ["g"], "v", k).withColumnRenamed("kmv", "kb")
    merged = a.join(b, "g").select(
        "g", sketch.merge_sketches(F.col("ka"), F.col("kb"), k).alias("kmv")
    )
    est_m = {
        r["g"]: r["est"]
        for r in merged.select(
            "g", sketch.estimate_from_sketch(F.col("kmv"), k).alias("est")
        ).collect()
    }
    est_full = {
        r["g"]: r["distinct_est"]
        for r in sketch.kmv_distinct(values, ["g"], "v", k).collect()
    }
    assert est_m == est_full
