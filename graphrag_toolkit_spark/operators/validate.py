"""Declarative data-quality validation (dbt-test / expectations style).

North-star lifecycle extension: every ingestion run should end with a
machine-checkable quality report — null checks, domain checks, range
checks, uniqueness, referential integrity — before data is published.
Rules compile to ONE pass over the table (a single aggregate of
conditional counts) plus one anti-join per foreign-key rule; the report
is rule-sized, never data-sized.

Rule forms (name, kind, params):
- ``not_null(col)``                 — col IS NULL counts as a violation
- ``in_set(col, values)``           — value outside the literal set
- ``range(col, lo, hi)``            — value < lo or > hi (inclusive bounds)
- ``regexp(col, pattern)``          — value does not match
- ``unique(col)``                   — rows beyond the first per value
- ``foreign_key(col, dim, dim_col)``— value absent from the dimension
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    kind: str
    col: str
    params: dict = field(default_factory=dict)


def not_null(col: str) -> Rule:
    return Rule(f"not_null_{col}", "not_null", col)


def in_set(col: str, values: list) -> Rule:
    return Rule(f"in_set_{col}", "in_set", col, {"values": list(values)})


def in_range(col: str, lo, hi) -> Rule:
    return Rule(f"range_{col}", "range", col, {"lo": lo, "hi": hi})


def regexp(col: str, pattern: str) -> Rule:
    return Rule(f"regexp_{col}", "regexp", col, {"pattern": pattern})


def unique(col: str) -> Rule:
    return Rule(f"unique_{col}", "unique", col)


def foreign_key(col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(f"fk_{col}", "foreign_key", col, {"dim": dim, "dim_col": dim_col})


def _violation_expr(r: Rule) -> Column:
    c = F.col(r.col)
    if r.kind == "not_null":
        return c.isNull()
    if r.kind == "in_set":
        return c.isNull() | ~c.isin(*r.params["values"])
    if r.kind == "range":
        return c.isNull() | (c < r.params["lo"]) | (c > r.params["hi"])
    if r.kind == "regexp":
        return c.isNull() | ~c.rlike(r.params["pattern"])
    raise ValueError(f"not a row-local rule: {r.kind}")


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Run all rules; returns (rule, n_violations, n_rows) — one row per
    rule. Row-local rules fuse into a single conditional-count aggregate
    (one scan); `unique` adds one groupBy on its column; each
    `foreign_key` adds one anti-join against its (broadcastable) dim."""
    row_local = [r for r in rules if r.kind in ("not_null", "in_set", "range", "regexp")]
    out = None
    if row_local:
        aggs = [
            F.sum(F.when(_violation_expr(r), 1).otherwise(0)).alias(r.name)
            for r in row_local
        ]
        wide = df.agg(*aggs, F.count(F.lit(1)).alias("__n"))
        stack = ", ".join(f"'{r.name}', {r.name}" for r in row_local)
        out = wide.selectExpr(
            f"stack({len(row_local)}, {stack}) as (rule, n_violations)", "__n as n_rows"
        )
    spark = df.sparkSession
    total = None  # lazily counted — only unique/foreign_key rules need it,
    # so a purely row-local rule set stays a single fused scan of the table
    extra_rows = []
    for r in rules:
        if r.kind in ("unique", "foreign_key") and total is None:
            total = df.count()
        if r.kind == "unique":
            dups = (
                df.groupBy(r.col)
                .agg(F.count(F.lit(1)).alias("_c"))
                .filter(F.col("_c") > 1)
                .agg(F.coalesce(F.sum(F.col("_c") - 1), F.lit(0)).alias("v"))
                .head()["v"]
            )
            extra_rows.append((r.name, int(dups)))
        elif r.kind == "foreign_key":
            dim = r.params["dim"].select(
                F.col(r.params["dim_col"]).alias(r.col)
            ).distinct()
            missing = df.select(r.col).join(dim, r.col, "left_anti").count()
            extra_rows.append((r.name, int(missing)))
    if extra_rows:
        extra = spark.createDataFrame(
            [{"rule": n, "n_violations": v, "n_rows": total} for n, v in extra_rows]
        ).select("rule", "n_violations", "n_rows")
        out = extra if out is None else out.unionByName(extra)
    return out


def assert_valid(df: DataFrame, rules: list[Rule]) -> None:
    """Raise ValueError listing every violated rule (publish gate)."""
    bad = [
        (r["rule"], r["n_violations"])
        for r in validate(df, rules).collect()
        if r["n_violations"] > 0
    ]
    if bad:
        raise ValueError(f"validation failed: {bad}")
