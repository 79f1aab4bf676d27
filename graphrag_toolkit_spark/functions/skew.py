"""Skew-handling primitives (SURVEY §4 "custom work" item 5).

Entity degree in a lexical graph is Zipfian — hub entities dominate the
SUBJECT/OBJECT and RELATION joins. AQE's skew-join split handles the join
case at runtime (enabled in ``session.py``); these helpers cover what AQE
does not:

- ``salted_join``: explode the SMALL side ``n_salts``× and spread the big
  side's hot keys across salts — for joins where the runtime split can't
  apply (e.g. followed by a hash aggregate that re-concentrates the key).
- ``two_phase_agg``: partial-aggregate per (key, salt) then final per key —
  the classic hot-key groupBy decomposition for algebraic aggregates.

Both are deterministic: the salt is a hash of a caller-named row-unique
column, never a random number (reruns and task retries must agree).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def widen_partitions(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input has fewer
    partitions. Explode-heavy stages (shingling, tokenization) expand a small
    input into millions of rows — if the source is a single parquet file the
    whole expansion runs on one core. The pre-explode shuffle moves only the
    *compact* rows, so it costs ~nothing relative to the fan-out it
    parallelizes; inputs already as wide as the cluster pass through
    untouched (no shuffle added at real scale)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_salt(df: DataFrame, unique_col: str, n_salts: int) -> DataFrame:
    """Deterministic salt ∈ [0, n_salts) from a row-unique column."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(unique_col)), F.lit(n_salts))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    big_unique_col: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions; the small side is replicated once per salt (explode — cheap
    when the small side is dimension-sized). Result is identical to
    ``big.join(small, key, how)``."""
    b = with_salt(big, big_unique_col, n_salts)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return b.join(s, [key, "_salt"], how).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str,
    unique_col: str,
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key groupBy as partial → final. ``aggs`` maps output name →
    (partial_agg_expr, final_agg_expr-over-partial); e.g.
    ``{"n": (F.count(F.lit(1)), F.sum), "total": (F.sum("x"), F.sum)}`` where
    the final expr is a callable applied to the partial column. Only
    algebraic aggregates decompose this way (count/sum/min/max — avg as
    sum+count)."""
    partial = (
        with_salt(df, unique_col, n_salts)
        .groupBy(key, "_salt")
        .agg(*[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()])
    )
    return partial.groupBy(key).agg(
        *[fin(F.col(f"_p_{name}")).alias(name) for name, (_, fin) in aggs.items()]
    )
