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


class TestCountMin:
    def test_never_undercounts_and_merges(self, spark):
        from pyspark.sql import functions as F

        from graphrag_toolkit_spark.operators import sketch

        vals = spark.createDataFrame(
            [(f"v{i % 50}",) for i in range(500)], "v string"
        )
        cms = sketch.cms_build(vals, "v", width=64)
        qs = vals.select("v").distinct()
        est = {
            r["value"]: r["est"]
            for r in sketch.cms_estimate(cms, qs, "v", width=64).collect()
        }
        true = {
            r["v"]: r["n"]
            for r in vals.groupBy("v").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert all(est[v] >= true[v] for v in true)          # CMS invariant
        assert sum(est[v] - true[v] for v in true) < 50 * 20  # collisions bounded

        # mergeability: sketches of two halves sum to the full sketch
        h1 = vals.limit(250)
        h2 = vals.exceptAll(h1)
        c1 = sketch.cms_build(h1, "v", width=64)
        c2 = sketch.cms_build(h2, "v", width=64)
        merged = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in c1.unionByName(c2)
            .groupBy("row", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
            .collect()
        }
        full = {(r["row"], r["bucket"]): r["cnt"] for r in cms.collect()}
        assert merged == full

    def test_absent_value_estimates_low(self, spark):
        from graphrag_toolkit_spark.operators import sketch

        vals = spark.createDataFrame([("a",), ("b",)], "v string")
        cms = sketch.cms_build(vals, "v")
        qs = spark.createDataFrame([("zz",)], "v string")
        est = sketch.cms_estimate(cms, qs, "v").collect()[0]["est"]
        assert est <= 2  # at most total mass; usually 0 with width 256


class TestBloom:
    def test_no_false_negatives(self, spark):
        from pyspark.sql import functions as F

        from graphrag_toolkit_spark.operators import sketch

        keys = spark.range(200).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
        bloom = sketch.bloom_build(keys, "v")
        probed = sketch.bloom_might_contain(keys, bloom, "v")
        assert probed.filter(~F.col("might_contain")).count() == 0

    def test_absent_keys_mostly_rejected(self, spark):
        from pyspark.sql import functions as F

        from graphrag_toolkit_spark.operators import sketch

        keys = spark.range(200).select(F.concat(F.lit("k"), F.col("id")).alias("v"))
        bloom = sketch.bloom_build(keys, "v")
        absent = spark.range(200).select(
            F.concat(F.lit("absent"), F.col("id")).alias("v")
        )
        fp = (
            sketch.bloom_might_contain(absent, bloom, "v")
            .filter(F.col("might_contain"))
            .count()
        )
        # n=200, m=4096, k=5 -> theoretical fp ~0.3%; allow generous slack
        assert fp <= 10

    def test_merge_is_word_or(self, spark):
        from pyspark.sql import functions as F

        from graphrag_toolkit_spark.operators import sketch

        a = spark.createDataFrame([("x",)], "v string")
        b = spark.createDataFrame([("y",)], "v string")
        both = a.unionByName(b)
        merged = (
            sketch.bloom_build(a, "v")
            .unionByName(sketch.bloom_build(b, "v"))
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        full = sketch.bloom_build(both, "v")
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))


def test_kmv_null_values_dont_burn_slots(spark):
    """A NULL value must be ignored, not consume a sketch slot: with k=8 and
    exactly 8 distinct non-null values per group, the estimate must take the
    exact-count branch (8.0) even when NULL rows are present."""
    from pyspark.sql import functions as F

    base = spark.range(64).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 8 == 7, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v"), (F.col("id") % 8).cast("string")))
        .alias("v"),  # 7 distinct non-null values + NULLs
    )
    sk = sketch.kmv_sketch(base, ["g"], "v", k=8).head()
    assert len(sk["kmv"]) == 7 and None not in sk["kmv"]
    est = sketch.kmv_distinct(base, ["g"], "v", k=8).head()["distinct_est"]
    assert est == 7.0


def test_kmv_partition_invariance(spark):
    from pyspark.sql import functions as F

    base = spark.range(3000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.concat(F.lit("v"), (F.col("id") * 17) % 900).alias("v"),
    )
    a = {
        r["g"]: r["distinct_est"]
        for r in sketch.kmv_distinct(base, ["g"], "v", k=32).collect()
    }
    b = {
        r["g"]: r["distinct_est"]
        for r in sketch.kmv_distinct(base.repartition(11), ["g"], "v", k=32).collect()
    }
    assert a == b


class TestHistogramQuantiles:
    def test_uniform_estimates_close_to_exact(self, spark):
        from pyspark.sql import functions as F

        df = spark.range(10000).select((F.col("id") % 1000).cast("double").alias("v"))
        hist = sketch.histogram_sketch(df, "v", 0.0, 1000.0, buckets=100)
        est = {r["q"]: r["est"] for r in
               sketch.quantiles_from_histogram(hist, [0.5, 0.9], 0.0, 1000.0, 100).collect()}
        assert abs(est[0.5] - 500.0) < 15.0
        assert abs(est[0.9] - 900.0) < 15.0

    def test_mergeable_cellwise(self, spark):
        from pyspark.sql import functions as F

        a = spark.range(0, 500).select(F.col("id").cast("double").alias("v"))
        b = spark.range(500, 1000).select(F.col("id").cast("double").alias("v"))
        merged = (
            sketch.histogram_sketch(a, "v", 0.0, 1000.0, 10)
            .unionByName(sketch.histogram_sketch(b, "v", 0.0, 1000.0, 10))
            .groupBy("bucket").agg(F.sum("n").alias("n"))
        )
        full = sketch.histogram_sketch(a.unionByName(b), "v", 0.0, 1000.0, 10)
        assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))

    def test_clamps_out_of_range(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([{"v": -5.0}, {"v": 9999.0}, {"v": 50.0}])
        rows = {r["bucket"]: r["n"] for r in
                sketch.histogram_sketch(df, "v", 0.0, 100.0, 10).collect()}
        assert rows == {0: 1, 9: 1, 5: 1}  # low->first, high->last


class TestKmvIntersection:
    def test_estimates_overlap(self, spark):
        from pyspark.sql import functions as F

        a = spark.range(0, 3000).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
        b = spark.range(1500, 4500).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
        sa = sketch.kmv_sketch(a, [], "v", k=256).select(F.col("kmv").alias("ka"))
        sb = sketch.kmv_sketch(b, [], "v", k=256).select(F.col("kmv").alias("kb"))
        est = (
            sa.crossJoin(sb)
            .select(sketch.kmv_intersection_estimate(F.col("ka"), F.col("kb"), 256).alias("e"))
            .head()["e"]
        )
        assert abs(est - 1500) / 1500 < 0.35  # k=256 -> ~6% sigma; 4+ sigma slack

    def test_exact_when_small(self, spark):
        from pyspark.sql import functions as F

        a = spark.range(0, 30).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
        b = spark.range(20, 50).select(F.concat(F.lit("u"), F.col("id")).alias("v"))
        sa = sketch.kmv_sketch(a, [], "v", k=256).select(F.col("kmv").alias("ka"))
        sb = sketch.kmv_sketch(b, [], "v", k=256).select(F.col("kmv").alias("kb"))
        est = (
            sa.crossJoin(sb)
            .select(sketch.kmv_intersection_estimate(F.col("ka"), F.col("kb"), 256).alias("e"))
            .head()["e"]
        )
        assert est == 10.0  # below k the sketch is the exact set


class TestHyperLogLog:
    def test_estimate_within_error_bound(self, spark):
        """5000 distinct values, m=64 → σ ≈ 1.04/√64 = 13%; assert within
        3σ (deterministic md5 hashing, so this is a fixed number, not a
        flaky draw)."""
        from graphrag_toolkit_spark.operators import sketch

        df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
        est = sketch.hll_estimate(sketch.hll_registers(df, "v")).collect()[0]
        assert abs(est["distinct_est"] - 5000) / 5000 < 0.39
        assert est["zero_registers"] == 0

    def test_small_range_linear_counting(self, spark):
        """3 distinct values: the correction branch fires (raw ≤ 2.5m,
        empty registers) and linear counting m·ln(m/V) lands near 3."""
        from graphrag_toolkit_spark.operators import sketch

        df = spark.createDataFrame([{"v": x} for x in ("a", "b", "c", "a")])
        est = sketch.hll_estimate(sketch.hll_registers(df, "v")).collect()[0]
        assert est["zero_registers"] == 61
        assert 2.0 < est["distinct_est"] < 4.5

    def test_registers_merge_by_max(self, spark):
        """Shard mergeability: max-merging two halves' register files
        equals the register file of the union — the property that makes
        HLL roll up across partitions/streams."""
        from graphrag_toolkit_spark.operators import sketch

        df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
        a = sketch.hll_registers(df.filter(F.col("v").cast("long") % 2 == 0), "v")
        b = sketch.hll_registers(df.filter(F.col("v").cast("long") % 2 == 1), "v")
        merged = (
            a.unionByName(b)
            .groupBy("idx")
            .agg(F.max("reg").cast("int").alias("reg"))
        )
        full = sketch.hll_registers(df, "v")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, full.collect())
        )
