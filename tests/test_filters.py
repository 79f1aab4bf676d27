"""Filter algebra: tree → Column and tree → SQL must agree (SURVEY P1-P5)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark.filters import (
    Condition,
    FilterConfig,
    MetadataFilter,
    MetadataFilters,
    Op,
    is_datetime_key,
    snapshot_predicate,
    tenant_predicate,
    to_column,
    to_sql,
    VALID_TO_MAX,
)

ROWS = [
    {"name": "alpha", "price": 10.0, "status": "O", "note": "Urgent order"},
    {"name": "beta", "price": 150.0, "status": "F", "note": ""},
    {"name": "gamma", "price": 75.0, "status": "O", "note": None},
    {"name": "alphabet", "price": 300.0, "status": "P", "note": "routine"},
]


def both(spark, tree):
    """Evaluate the tree via Spark Column AND via rendered SQL in DuckDB;
    return (spark_names, duckdb_names)."""
    df = spark.createDataFrame(ROWS)
    got_spark = sorted(r["name"] for r in df.filter(to_column(tree)).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (name VARCHAR, price DOUBLE, status VARCHAR, note VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?, ?)",
        [(r["name"], r["price"], r["status"], r["note"]) for r in ROWS],
    )
    got_duck = sorted(
        row[0] for row in con.execute(f"SELECT name FROM t WHERE {to_sql(tree)}").fetchall()
    )
    return got_spark, got_duck


CASES = [
    MetadataFilter("status", Op.EQ, "O"),
    MetadataFilter("price", Op.GT, 75.0),
    MetadataFilter("price", Op.LTE, 75.0),
    MetadataFilter("name", Op.STARTS_WITH, "alpha"),
    MetadataFilter("name", Op.IN, ["beta", "gamma"]),
    MetadataFilter("note", Op.IS_EMPTY),
    MetadataFilter("note", Op.TEXT_MATCH, "rgent"),
    MetadataFilter("note", Op.TEXT_MATCH_INSENSITIVE, "URGENT"),
    MetadataFilters(
        condition=Condition.AND,
        filters=[
            MetadataFilter("status", Op.EQ, "O"),
            MetadataFilter("price", Op.LT, 50.0),
        ],
    ),
    MetadataFilters(
        condition=Condition.OR,
        filters=[
            MetadataFilter("status", Op.EQ, "P"),
            MetadataFilters(
                condition=Condition.NOT,
                filters=[MetadataFilter("name", Op.STARTS_WITH, "alpha")],
            ),
        ],
    ),
]


@pytest.mark.parametrize("tree", CASES, ids=range(len(CASES)))
def test_spark_and_sql_agree(spark, tree):
    got_spark, got_duck = both(spark, tree)
    assert got_spark == got_duck


def test_text_match_case_sensitivity(spark):
    sensitive, _ = both(spark, MetadataFilter("note", Op.TEXT_MATCH, "URGENT"))
    insensitive, _ = both(spark, MetadataFilter("note", Op.TEXT_MATCH_INSENSITIVE, "URGENT"))
    assert sensitive == []
    assert insensitive == ["alpha"]


def test_not_requires_single_child():
    bad = MetadataFilters(
        condition=Condition.NOT,
        filters=[MetadataFilter("a", Op.EQ, 1), MetadataFilter("b", Op.EQ, 2)],
    )
    with pytest.raises(ValueError):
        to_column(bad)


def test_datetime_key_inference():
    assert is_datetime_key("published_date")
    assert is_datetime_key("created_datetime")
    assert not is_datetime_key("date_of_thing")


def test_snapshot_predicate_current(spark):
    df = spark.createDataFrame(
        [
            {"id": "a", "valid_from": 0, "valid_to": VALID_TO_MAX},
            {"id": "b", "valid_from": 0, "valid_to": 500},
        ]
    )
    cur = [r["id"] for r in df.filter(snapshot_predicate(None)).collect()]
    assert cur == ["a"]
    at = [r["id"] for r in df.filter(snapshot_predicate(100)).orderBy("id").collect()]
    assert at == ["a", "b"]


def test_tenant_predicate_default(spark):
    df = spark.createDataFrame([{"id": 1, "tenant_id": ""}, {"id": 2, "tenant_id": "t1"}])
    assert [r["id"] for r in df.filter(tenant_predicate(None)).collect()] == [1]
    assert [r["id"] for r in df.filter(tenant_predicate("t1")).collect()] == [2]


def test_filter_config_defaults():
    cfg = FilterConfig()
    assert cfg.source_filters is None and cfg.as_of is None
