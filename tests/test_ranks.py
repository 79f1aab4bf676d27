"""operators/ranks.py — the two-phase distributed rank helper.

Every assertion here is EQUALITY against the single-partition window the
helper replaces: for any monotone bucketing the two-phase rank must equal
``row_number() OVER (ORDER BY ...)`` row for row, so every oracle that was
hash-exact with the global window stays hash-exact after a rewrite."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.operators import ranks


def _global_rn(df, order_cols):
    return df.withColumn("rn_ref", F.row_number().over(Window.orderBy(*order_cols)))


@pytest.fixture(scope="module")
def skewed(spark):
    # 500 rows: heavy ties (v = i % 7 concentrates buckets), a string id,
    # negatives and an identical-value run — the tie/skew shapes that break
    # naive range bucketing.
    rows = [(f"id{i:04d}", (i * 37) % 7 - 3, float((i * i) % 101) / 7.0)
            for i in range(500)]
    return spark.createDataFrame(rows, "id string, v int, x double")


def test_matches_global_row_number_int_key(skewed):
    order = [F.asc("v"), F.asc("id")]
    got = ranks.two_phase_row_number(
        ranks.with_range_bucket(skewed, F.col("v"), n_buckets=8), order
    )
    ref = _global_rn(skewed, order)
    joined = got.join(ref, ["id", "v", "x"])
    assert joined.count() == 500
    assert joined.filter(F.col("rn") != F.col("rn_ref")).count() == 0


def test_matches_global_row_number_desc_double_key(skewed):
    order = [F.desc("x"), F.asc("id")]
    # DESC numeric key → bucket the negated key
    got = ranks.two_phase_row_number(
        ranks.with_range_bucket(skewed, -F.col("x"), n_buckets=16), order
    )
    ref = _global_rn(skewed, order)
    assert (
        got.join(ref, ["id", "v", "x"])
        .filter(F.col("rn") != F.col("rn_ref"))
        .count()
        == 0
    )


def test_hex_prefix_bucket_matches_md5_order(skewed):
    key = F.md5(F.concat(F.lit("t|"), F.col("id")))
    df = skewed.withColumn("h", key)
    order = [F.asc("h"), F.asc("id")]
    got = ranks.two_phase_row_number(
        df.withColumn(ranks.BUCKET_COL, ranks.hex_prefix_bucket(F.col("h"), 2)),
        order,
    )
    ref = _global_rn(df, order)
    assert (
        got.join(ref, ["id", "h"]).filter(F.col("rn") != F.col("rn_ref")).count()
        == 0
    )


def test_total_col_is_exact_count(skewed):
    got = ranks.two_phase_row_number(
        ranks.with_range_bucket(skewed, F.col("v")),
        [F.asc("v"), F.asc("id")],
        total_col="n_total",
    )
    assert got.filter(F.col("n_total") != 500).count() == 0


def test_constant_key_single_bucket(spark):
    # hi == lo degenerate: everything lands in bucket 0, rank still exact
    df = spark.createDataFrame([(i, 42) for i in range(50)], "id int, v int")
    got = ranks.two_phase_row_number(
        ranks.with_range_bucket(df, F.col("v")), [F.asc("v"), F.asc("id")]
    )
    ref = _global_rn(df, [F.asc("v"), F.asc("id")])
    assert (
        got.join(ref, ["id", "v"]).filter(F.col("rn") != F.col("rn_ref")).count()
        == 0
    )


def test_two_phase_cumsum_matches_window(skewed):
    order = [F.asc("v"), F.asc("id")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    ref = skewed.withColumn("cum_ref", F.sum(F.col("x").cast("long") + 1).over(w))
    got = ranks.two_phase_cumsum(
        ranks.with_range_bucket(skewed, F.col("v"), n_buckets=8),
        order,
        F.col("x").cast("long") + 1,
    )
    assert (
        got.join(ref, ["id", "v", "x"])
        .filter(F.col("cum") != F.col("cum_ref"))
        .count()
        == 0
    )


@pytest.mark.parametrize("n,k", [(10, 4), (500, 10), (3, 5), (7, 7), (1, 3)])
def test_ntile_matches_builtin(spark, n, k):
    df = spark.createDataFrame([(i,) for i in range(n)], "id int")
    ref = df.withColumn(
        "t_ref", F.ntile(k).over(Window.orderBy("id"))
    )
    got = (
        ranks.two_phase_row_number(
            ranks.with_range_bucket(df, F.col("id"), n_buckets=4),
            [F.asc("id")],
            total_col="n",
        )
        .withColumn("t", ranks.ntile_from_rank(F.col("rn"), F.col("n"), k))
    )
    assert (
        got.join(ref, "id").filter(F.col("t") != F.col("t_ref")).count() == 0
    )


def test_plan_has_no_singlepartition_window_over_input(skewed):
    """The whole point: the only SinglePartition exchange in the plan feeds
    the ≤n_buckets offsets table, never the input rows."""
    import io
    from contextlib import redirect_stdout

    got = ranks.two_phase_row_number(
        ranks.with_range_bucket(skewed, F.col("v"), n_buckets=8),
        [F.asc("v"), F.asc("id")],
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain(mode="formatted")
    plan = buf.getvalue()
    # the per-row window is hash-partitioned on the bucket
    assert f"partitionBy: [{ranks.BUCKET_COL}" in plan.replace("#", " #").replace(
        "  ", " "
    ) or ranks.BUCKET_COL in plan
    # exactly the offsets aggregate may sit under a SinglePartition exchange
    import re

    sp = len(re.findall(r"Exchange SinglePartition", plan))
    assert sp <= 1


def test_running_sums_match_global_windows(skewed):
    """two_phase_running_sums == the single-partition inclusive cumsums for
    several value columns under one total order, including heavy ties."""
    vals = {
        "cum_a": F.when(F.col("v") > 0, 1).otherwise(0),
        "cum_b": (F.col("v") % 2 == 0).cast("int"),
    }
    got = ranks.two_phase_running_sums(
        ranks.with_range_bucket(skewed, F.col("x"), n_buckets=16),
        [F.asc("x"), F.asc("id")],
        vals,
    )
    w = Window.orderBy(F.asc("x"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ref = skewed
    for name, v in vals.items():
        ref = ref.withColumn(name + "_ref", F.sum(v).over(w))
    merged = got.join(ref.select("id", "cum_a_ref", "cum_b_ref"), "id")
    bad = merged.filter(
        (F.col("cum_a") != F.col("cum_a_ref"))
        | (F.col("cum_b") != F.col("cum_b_ref"))
    ).count()
    assert bad == 0 and got.count() == 500


def test_prefix_min_excl_matches_global_window(skewed):
    """two_phase_prefix_min_excl == min() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING..1 PRECEDING), NULL on the overall first row; desc key via
    negation (the Pareto skyline's shape)."""
    got = ranks.two_phase_prefix_min_excl(
        ranks.with_range_bucket(skewed, -F.col("x"), n_buckets=16),
        [F.desc("x"), F.asc("id")],
        F.col("v"),
    )
    w = Window.orderBy(F.desc("x"), F.asc("id")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    ref = skewed.withColumn("pm_ref", F.min("v").over(w))
    merged = got.join(ref.select("id", "pm_ref"), "id")
    bad = merged.filter(
        ~(
            (F.col("prefix_min") == F.col("pm_ref"))
            | (F.col("prefix_min").isNull() & F.col("pm_ref").isNull())
        )
    ).count()
    assert bad == 0
    assert merged.filter(F.col("prefix_min").isNull()).count() == 1
