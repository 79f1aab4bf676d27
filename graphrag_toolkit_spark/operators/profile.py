"""Table profiling: per-column completeness and cardinality in ONE scan.

North-star data-quality staple (the ANALYZE/dbt-source-freshness analog):
before publishing a table, record per column how complete it is and how
many distinct values it holds. All counts fuse into a single aggregate
projection — one pass over the table regardless of column count — then
unpivot to the (column, metric...) report shape.

Distinct counts are EXACT (count_distinct per column in the same fused
aggregate; Spark expands multi-distinct aggregates internally) — at
extreme widths swap in the KMV sketch (`operators/sketch.py`) per column
for fixed memory; the report schema stays identical.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """(column, n_rows, n_nulls, null_frac, n_distinct) per column — one
    fused scan. NULLs are excluded from n_distinct (matching
    COUNT(DISTINCT col) semantics in any engine)."""
    cols = list(cols) if cols else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', __null_{c}, __dist_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column, n_nulls, n_distinct)",
        "__n AS n_rows",
    ).select(
        "column",
        "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        (F.col("n_nulls").cast("double") / F.col("n_rows")).alias("null_frac"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )
