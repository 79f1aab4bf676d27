"""Formatting-processor chain over nested SearchResult rows (SURVEY §2.10,
reference DEFAULT_FORMATTING_PROCESSORS, traversal_based_base_retriever.py:39-46).
All processors are higher-order array expressions — the plan test pins that
the chain adds no exchange beyond nest_results' own."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark import fixtures
from graphrag_toolkit_spark.operators import formatting
from graphrag_toolkit_spark.query_engine import chunk_based_search


@pytest.fixture(scope="module")
def g(spark):
    return fixtures.generate("t1", seed=42).to_spark(spark)


_NESTED_SCHEMA = (
    "source_id string, score double, topics array<struct<"
    "topic_id string, topic string, "
    "chunks array<struct<chunk_id string, chunk_text string>>, "
    "statements array<struct<statement_id string, value string, "
    "details string, facts array<string>, score double>>>>"
)


@pytest.fixture(scope="module")
def nested(spark, g):
    out = chunk_based_search(g, "filter join window")
    return out.localCheckpoint(eager=True)


class TestStatementsToStrings:
    def test_statements_become_ordered_strings(self, nested):
        rows = formatting.statements_to_strings(nested).collect()
        assert rows
        for r in rows:
            for t in r["topics"]:
                assert all(isinstance(s, str) for s in t["statements"])

    def test_details_and_facts_render(self, spark):
        nested = spark.createDataFrame(
            [
                (
                    "s1",
                    1.0,
                    [
                        (
                            "t1",
                            "alpha",
                            [("c1", "x")],
                            [
                                ("st1", "v plain", "", [], 1.0),
                                ("st2", "v rich", "d1\nd2", ["f1"], 2.0),
                            ],
                        )
                    ],
                )
            ],
            schema=_NESTED_SCHEMA,
        )
        out = formatting.statements_to_strings(nested).collect()[0]
        stmts = out["topics"][0]["statements"]
        # score desc: rich statement first, with facts then detail lines
        assert stmts[0] == "v rich (details: f1, d1, d2)"
        assert stmts[1] == "v plain"


class TestSimplifyAndClear:
    def test_single_topic_lifts_and_clears(self, spark):
        base = spark.createDataFrame(
            [
                ("s1", 1.0, [("t1", "only", [], [("a", "v", "", [], 1.0)])]),
                ("s2", 0.5, [("t2", "two-a", [], []), ("t3", "two-b", [], [])]),
            ],
            schema=_NESTED_SCHEMA,
        )
        out = {
            r["source_id"]: r
            for r in formatting.simplify_single_topic_results(
                formatting.statements_to_strings(base)
            ).collect()
        }
        assert out["s1"]["topic"] == "only"
        assert out["s1"]["statements"] == ["v"]
        assert out["s1"]["topics"] == []
        assert out["s2"]["topic"] is None
        assert len(out["s2"]["topics"]) == 2

    def test_clear_chunks_and_topic_ids(self, nested):
        out = formatting.clear_topic_ids(formatting.clear_chunks(nested)).collect()
        for r in out:
            for t in r["topics"]:
                assert t["chunks"] == []
                assert t["topic_id"] is None


class TestFormatSources:
    def test_default_formatter_longest_value_first(self, spark, nested):
        meta = spark.createDataFrame(
            [
                {"source_id": r["source_id"],
                 "metadata": {"title": "A Very Long Document Title", "y": "2024"}}
                for r in nested.select("source_id").distinct().collect()
            ]
        )
        out = formatting.format_sources(nested, meta).collect()
        assert all(
            r["source_str"] == "A Very Long Document Title (2024)" for r in out
        )

    def test_no_metadata_falls_back_to_source_id(self, nested):
        out = formatting.format_sources(nested).collect()
        assert all(r["source_str"] == r["source_id"] for r in out)


class TestFormatChain:
    def test_chain_composes_and_truncates(self, nested):
        out = formatting.format_chain(nested, max_results=2)
        rows = out.collect()
        assert len(rows) <= 2
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)

    def test_chain_adds_no_python_eval(self, nested):
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            formatting.format_chain(nested).explain()
        plan = buf.getvalue()
        assert "EvalPython" not in plan and "Arrow" not in plan


class TestDisaggregateAndClearScores:
    def test_disaggregate_one_result_per_topic(self, spark):
        base = spark.createDataFrame(
            [
                ("s1", 1.0, [("t1", "a", [], []), ("t2", "b", [], [])]),
                ("s2", 0.5, [("t3", "c", [], [])]),
            ],
            schema=_NESTED_SCHEMA,
        )
        rows = formatting.disaggregate_results(base).collect()
        assert len(rows) == 3
        assert all(len(r["topics"]) == 1 for r in rows)
        assert sorted(r["topics"][0]["topic"] for r in rows) == ["a", "b", "c"]

    def test_clear_scores_zeroes_all_levels(self, spark):
        base = spark.createDataFrame(
            [("s1", 0.8, [("t1", "a", [], [("x", "v", "", [], 0.7)])])],
            schema=_NESTED_SCHEMA,
        )
        r = formatting.clear_scores(base).collect()[0]
        assert r["score"] == 0.0
        assert r["topics"][0]["statements"][0]["score"] == 0.0
