"""Two-phase distributed ranking — the scale-safe replacement for
``Window.orderBy(...)`` with no ``partitionBy`` (which Catalyst compiles to
``Exchange SinglePartition → Sort → Window``: ONE task sorts the entire
input, a parallelism ceiling invisible at fixture scale).

The recipe (proven hash-exact at the Z-order site, ``packing.py:318``, and
defended in SCALE.md): coarse-bucket rows on a MONOTONE function of the
leading sort key, count rows per bucket, turn the (tiny, bounded) bucket
table into cumulative offsets with a window that is single-partition but
over ≤ ``n_buckets`` rows, broadcast-join the offsets back, and rank inside
each bucket with a PARTITIONED window:

    global_rank(row) = offset(bucket(row)) + rank_within_bucket(row)

Exactness: the result equals the single-partition ``row_number`` for ANY
monotone bucketing — bucket choice changes only the physical plan, never a
value — so every oracle that was hash-exact before a rewrite stays
hash-exact after it.

Monotonicity contract: ``bucket`` must be deterministic and non-decreasing
w.r.t. the TOTAL order of ``order_cols`` (equivalently: a function of the
leading key alone that never inverts its direction). For a DESC numeric
leading key pass the negated key to the bucket builder. Ties on the leading
key always share a bucket (bucket is a function of the key), so tiebreak
columns resolve inside the per-bucket window.

Skew note: all rows tied on one leading-key value land in one bucket — the
same rows a single-partition window would co-sort anyway; the two-phase form
is never worse and is n_buckets× more parallel on distinct keys.

NULL keys: callers must pre-filter or never produce NULL leading keys (a
NULL key would need a NULLS FIRST/LAST bucket pin that Spark and ANSI SQL
disagree on by default). Every call site in this repo feeds non-null keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Bucket-count ceiling: the offsets table (and its single-partition window)
# is bounded by this, independent of input size. 1024 buckets × 1 row is a
# broadcast-trivial table; at 100 TB each bucket still holds ~100 GB of rows
# to rank in parallel (raise n_buckets per call site if per-bucket volume
# ever dominates — exactness is bucket-count-independent).
DEFAULT_BUCKETS = 1024

BUCKET_COL = "__tpb"  # test_plans.py's plan guard allowlists aggregates on it


def hex_prefix_bucket(col: Column, chars: int = 3) -> Column:
    """Monotone bucket for a LOWERCASE-HEX-string sort key (md5 hashes):
    the first ``chars`` hex digits as an integer — 16^chars buckets,
    near-uniform for hash keys, and order-preserving because fixed-width
    lowercase hex compares identically as string and as number."""
    return F.conv(F.substring(col, 1, chars), 16, 10).cast("long")


def with_range_bucket(
    df: DataFrame,
    key: Column,
    n_buckets: int = DEFAULT_BUCKETS,
    bucket_col: str = BUCKET_COL,
) -> DataFrame:
    """Attach an equi-width monotone bucket of a NUMERIC ascending sort key
    (for a DESC key pass the negated key). Bounds come from one narrow
    min/max aggregate broadcast back in-plan — no driver round-trip.

    Monotone under IEEE semantics: subtraction, division by a positive
    constant-sign width, multiplication by a positive count and ``floor``
    are each order-preserving (correctly-rounded ops preserve ≤), so
    ``x1 <= x2 ⇒ bucket(x1) <= bucket(x2)`` holds exactly — which is all
    two-phase ranking needs (bucket boundaries never affect values)."""
    bounds = df.agg(F.min(key).alias("__blo"), F.max(key).alias("__bhi"))
    lo, hi = F.col("__blo").cast("double"), F.col("__bhi").cast("double")
    x = key.cast("double")
    bucket = F.when(hi > lo, F.least(
        F.floor((x - lo) / (hi - lo) * F.lit(float(n_buckets))).cast("long"),
        F.lit(n_buckets - 1),
    )).otherwise(F.lit(0))
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(bucket_col, bucket)
        .drop("__blo", "__bhi")
    )


def bucket_offsets(
    rows: DataFrame,
    bucket_col: str = BUCKET_COL,
    weight: Column | None = None,
) -> DataFrame:
    """The tiny phase-1 table: per bucket its count (or weight sum), the
    cumulative offset of everything in EARLIER buckets, and the grand
    total. The cumulative window here is single-partition by design — over
    a table bounded by the bucket count, never by the input (the plan
    guard's allowlisted shape: aggregate on ``__tpb*`` feeding the window).

    Returns (bucket_col, __cnt, __off, __n_total)."""
    w_val = weight if weight is not None else F.lit(1)
    g = rows.groupBy(bucket_col).agg(F.sum(w_val).cast("long").alias("__cnt"))
    wcum = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.partitionBy()
    return g.select(
        bucket_col,
        "__cnt",
        F.coalesce(F.sum("__cnt").over(wcum), F.lit(0)).alias("__off"),
        F.sum("__cnt").over(wall).alias("__n_total"),
    )


def two_phase_row_number(
    df: DataFrame,
    order_cols: Sequence[Column],
    bucket_col: str = BUCKET_COL,
    out_col: str = "rn",
    total_col: str | None = None,
    drop_bucket: bool = True,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_cols)`` with no
    single-partition pass over the input. ``df`` must already carry the
    monotone bucket column (``with_range_bucket`` / ``hex_prefix_bucket``).
    Optionally emits the exact total row count (``total_col``) — from the
    tiny bucket table, replacing the other classic single-partition window
    (``count(*) OVER ()``) for free."""
    offs = bucket_offsets(df, bucket_col)
    w = Window.partitionBy(bucket_col).orderBy(*order_cols)
    keep = [bucket_col, "__off"] + (["__n_total"] if total_col else [])
    out = (
        df.join(F.broadcast(offs.select(*keep)), bucket_col)
        .withColumn(out_col, F.col("__off") + F.row_number().over(w))
        .drop("__off")
    )
    if total_col:
        out = out.withColumnRenamed("__n_total", total_col)
    return out.drop(bucket_col) if drop_bucket else out


def two_phase_cumsum(
    df: DataFrame,
    order_cols: Sequence[Column],
    value: Column,
    bucket_col: str = BUCKET_COL,
    out_col: str = "cum",
) -> DataFrame:
    """Exact inclusive running sum of an INTEGER ``value`` under the total
    order — ``sum(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING..0)``
    — distributed the same way: per-bucket partitioned running sums plus
    the broadcast cumulative bucket totals."""
    offs = bucket_offsets(df, bucket_col, weight=value)
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.join(F.broadcast(offs.select(bucket_col, "__off")), bucket_col)
        .withColumn(out_col, F.col("__off") + F.sum(value).over(w))
        .drop("__off", bucket_col)
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact integer division of non-negative integer columns: subtract the
    remainder first so the IEEE division is integer-valued (exact below
    2^53 — far beyond any row count this helper ranks)."""
    return ((a - a % b) / b).cast("long")


def ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """SQL-standard ``NTILE(k)`` reconstructed from the exact global rank
    and total count — all-integer arithmetic, so it matches the engine
    built-in bit-for-bit: with q = n div k and r = n mod k, the first r
    tiles hold q+1 rows and the rest hold q. The ``greatest(q, 1)`` guard
    only shields the never-taken branch when n < k (then thr = n and every
    rank takes the first branch); it cannot change a taken value."""
    q = _idiv(n, F.lit(k))
    r = n % F.lit(k)
    thr = r * (q + 1)
    return (
        F.when(rank <= thr, _idiv(rank - 1, q + 1) + 1)
        .otherwise(r + _idiv(rank - thr - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )


def two_phase_running_sums(
    df: DataFrame,
    order_cols: Sequence[Column],
    values: dict[str, Column],
    bucket_col: str = BUCKET_COL,
) -> DataFrame:
    """``two_phase_cumsum`` for SEVERAL integer value columns at once —
    one bucket aggregate carries every column's cumulative offset, one
    broadcast join, one partitioned window per value. Used where a query
    needs parallel running sums under the same total order (e.g. the KS
    statistic's two half-corpus CDFs)."""
    aggs = [F.sum(v).cast("long").alias(f"__s_{name}") for name, v in values.items()]
    g = df.groupBy(bucket_col).agg(*aggs)
    wcum = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    offs = g.select(
        bucket_col,
        *[
            F.coalesce(F.sum(f"__s_{name}").over(wcum), F.lit(0)).alias(
                f"__off_{name}"
            )
            for name in values
        ],
    )
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df.join(F.broadcast(offs), bucket_col)
    for name, v in values.items():
        out = out.withColumn(name, F.col(f"__off_{name}") + F.sum(v).over(w))
    return out.drop(bucket_col, *[f"__off_{name}" for name in values])


def two_phase_prefix_min_excl(
    df: DataFrame,
    order_cols: Sequence[Column],
    value: Column,
    bucket_col: str = BUCKET_COL,
    out_col: str = "prefix_min",
) -> DataFrame:
    """Exact EXCLUSIVE running minimum under the total order —
    ``min(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING..1 PRECEDING)``
    (NULL on the first row) — distributed the same way: the tiny bucket
    table carries each bucket's min over all EARLIER buckets, the
    per-bucket exclusive running min is a partitioned window, and the two
    combine with ``least`` (which skips NULLs, so the first row of the
    first bucket stays NULL exactly like the single-partition form).
    Powers the Pareto-frontier skyline scan at unbounded axis
    cardinality."""
    g = df.groupBy(bucket_col).agg(F.min(value).alias("__bmin"))
    wprev = Window.orderBy(bucket_col).rowsBetween(Window.unboundedPreceding, -1)
    offs = g.select(
        bucket_col, F.min("__bmin").over(wprev).alias("__prevmin")
    )
    w = (
        Window.partitionBy(bucket_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.join(F.broadcast(offs), bucket_col)
        .withColumn(out_col, F.least(F.col("__prevmin"), F.min(value).over(w)))
        .drop("__prevmin", bucket_col)
    )
