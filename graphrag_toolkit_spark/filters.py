"""Metadata filter algebra → Catalyst Column expressions (SURVEY.md §2.2).

Parity targets in the reference:
- operator set + recursive tree translation: ``storage/graph/graph_utils.py:159-340``
  (the same logical tree is compiled to Cypher, OpenSearch DSL, and pgvector
  SQL there; here it compiles to ONE target — a ``pyspark.sql.Column`` — and
  Catalyst pushes it down to the parquet scan for free).
- typed literal formatting: ``graph_utils.py:206-236`` / ``metadata.py:63-132``
  (text / int / float / timestamp inference; datetime-ness from key suffixes
  ``_date`` / ``_datetime``).
- versioning predicates: ``versioning.py:25-31`` (snapshot filters).
- post-hoc dictionary filter: ``metadata.py:219-320`` — in Spark the *same*
  compiled Column filters a result DataFrame, so P1 and P5 share one code path.

The tree is deliberately engine-agnostic (plain dataclasses) so it can also be
rendered to ANSI SQL for the DuckDB oracle — ``to_sql`` — guaranteeing the
Spark plan and the oracle agree on semantics by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from enum import Enum
from typing import Union

from pyspark.sql import Column
from pyspark.sql import functions as F

# Sentinel bounds used by the versioning scheme (reference versioning.py:13-23).
VALID_FROM_MIN = -1
VALID_TO_MAX = 10_000_000_000_000


class Op(str, Enum):
    EQ = "eq"
    NE = "ne"
    GT = "gt"
    GTE = "gte"
    LT = "lt"
    LTE = "lte"
    TEXT_MATCH = "text_match"
    TEXT_MATCH_INSENSITIVE = "text_match_insensitive"
    IS_EMPTY = "is_empty"
    IN = "in"
    STARTS_WITH = "starts_with"


class Condition(str, Enum):
    AND = "and"
    OR = "or"
    NOT = "not"


Scalar = Union[str, int, float, datetime, None]


@dataclass(frozen=True)
class MetadataFilter:
    key: str
    operator: Op
    value: Scalar | list[Scalar] = None


@dataclass(frozen=True)
class MetadataFilters:
    filters: list[Union["MetadataFilters", MetadataFilter]]
    condition: Condition = Condition.AND


@dataclass(frozen=True)
class FilterConfig:
    """Root filter object handed to retrieval entry points."""

    source_filters: MetadataFilters | None = None
    tenant_id: str | None = None
    # snapshot timestamp (epoch millis) for versioned reads; None = CURRENT
    as_of: int | None = None
    extra: dict = field(default_factory=dict)


def is_datetime_key(key: str) -> bool:
    """Key-suffix-driven timestamp typing (reference config.py:52)."""
    return key.endswith("_date") or key.endswith("_datetime")


def _lit(value: Scalar) -> Column:
    if isinstance(value, datetime):
        return F.lit(value)
    return F.lit(value)


def _leaf_to_column(f: MetadataFilter) -> Column:
    c = F.col(f.key)
    op = f.operator
    if op is Op.EQ:
        return c == _lit(f.value)
    if op is Op.NE:
        return c != _lit(f.value)
    if op is Op.GT:
        return c > _lit(f.value)
    if op is Op.GTE:
        return c >= _lit(f.value)
    if op is Op.LT:
        return c < _lit(f.value)
    if op is Op.LTE:
        return c <= _lit(f.value)
    if op is Op.TEXT_MATCH:
        return c.contains(str(f.value))
    if op is Op.TEXT_MATCH_INSENSITIVE:
        return F.lower(c).contains(str(f.value).lower())
    if op is Op.IS_EMPTY:
        return c.isNull() | (c.cast("string") == F.lit(""))
    if op is Op.IN:
        return c.isin(list(f.value))
    if op is Op.STARTS_WITH:
        return c.startswith(str(f.value))
    raise ValueError(f"unsupported operator: {op}")


def to_column(node: MetadataFilters | MetadataFilter) -> Column:
    """Compile a filter tree to one Catalyst Column (pushdown-eligible)."""
    if isinstance(node, MetadataFilter):
        return _leaf_to_column(node)
    children = [to_column(child) for child in node.filters]
    if node.condition is Condition.NOT:
        if len(children) != 1:
            raise ValueError("NOT takes exactly one child")
        return ~children[0]
    out = children[0]
    for child in children[1:]:
        out = (out & child) if node.condition is Condition.AND else (out | child)
    return out


# --- ANSI SQL rendering (oracle parity) -------------------------------------

def _sql_quote(value: Scalar) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, str):
        return "'" + value.replace("'", "''") + "'"
    if isinstance(value, datetime):
        return f"TIMESTAMP '{value.isoformat(sep=' ')}'"
    return repr(value)


def _leaf_to_sql(f: MetadataFilter) -> str:
    k, op = f.key, f.operator
    simple = {
        Op.EQ: "=",
        Op.NE: "<>",
        Op.GT: ">",
        Op.GTE: ">=",
        Op.LT: "<",
        Op.LTE: "<=",
    }
    if op in simple:
        return f"{k} {simple[op]} {_sql_quote(f.value)}"
    if op is Op.TEXT_MATCH:
        return f"contains({k}, {_sql_quote(str(f.value))})"
    if op is Op.TEXT_MATCH_INSENSITIVE:
        return f"contains(lower({k}), {_sql_quote(str(f.value).lower())})"
    if op is Op.IS_EMPTY:
        # STRING parses in both Spark SQL and DuckDB; bare VARCHAR does not
        # parse in Spark (requires a length)
        return f"({k} IS NULL OR CAST({k} AS STRING) = '')"
    if op is Op.IN:
        vals = ", ".join(_sql_quote(v) for v in f.value)
        return f"{k} IN ({vals})"
    if op is Op.STARTS_WITH:
        return f"{k} LIKE {_sql_quote(str(f.value) + '%')}"
    raise ValueError(f"unsupported operator: {op}")


def to_sql(node: MetadataFilters | MetadataFilter) -> str:
    """Render the same tree as an ANSI SQL predicate (DuckDB oracle)."""
    if isinstance(node, MetadataFilter):
        return _leaf_to_sql(node)
    parts = [to_sql(child) for child in node.filters]
    if node.condition is Condition.NOT:
        return f"(NOT {parts[0]})"
    joiner = " AND " if node.condition is Condition.AND else " OR "
    return "(" + joiner.join(parts) + ")"


# --- Versioning predicates (P4) ----------------------------------------------

def snapshot_predicate(as_of: int | None) -> Column:
    """CURRENT (valid_to at the open sentinel) or AT_TIMESTAMP window filter."""
    if as_of is None:
        return F.col("valid_to") == F.lit(VALID_TO_MAX)
    ts = F.lit(as_of)
    return (F.col("valid_from") <= ts) & (F.col("valid_to") > ts)


def tenant_predicate(tenant_id: str | None) -> Column:
    """Multi-tenancy as a partition-column equality (prunes at scan time)."""
    return F.col("tenant_id") == F.lit(tenant_id or "")


def with_tenant(df, tenant_id: str | None):
    """Stamp rows with the tenant partition column on the write path. The
    reference rewrites labels/index names per tenant (``tenant_id.py:74-160``,
    ``multi_tenant_graph_store.py``); one partition column replaces that
    whole mechanism — writes go to the tenant's partitions, reads prune to
    them."""
    return df.withColumn("tenant_id", F.lit(tenant_id or ""))


def for_tenant(df, tenant_id: str | None):
    """Read-path counterpart: restrict to one tenant's partitions."""
    return df.filter(tenant_predicate(tenant_id))
