"""§3.2 composition (composite weighted retrieval, LLM query decomposition)
and V7 reranker plumbing — deterministic fakes, fixture graph."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark import fixtures, query_engine
from graphrag_toolkit_spark.operators import rerank


@pytest.fixture(scope="module")
def g(spark):
    return fixtures.generate("t1").to_spark(spark)


class TestCompositeSearch:
    def test_composite_matches_single_when_one_branch(self, g):
        single = query_engine.chunk_based_search(g, "alpha beta")
        comp = query_engine.composite_search(g, [("alpha beta", 1.0)])
        assert {r["source_id"] for r in single.collect()} == {
            r["source_id"] for r in comp.collect()
        }

    def test_two_branches_union(self, g):
        out = query_engine.composite_search(
            g, [("alpha beta", 1.0), ("gamma delta", 0.5)]
        )
        rows = out.collect()
        assert 0 < len(rows) <= query_engine.RetrievalConfig().max_search_results

    def test_decomposed_search_uses_llm_subqueries(self, g):
        prompts = []

        def fake_llm(prompt: str) -> str:
            prompts.append(prompt)
            return "alpha beta\ngamma delta"

        out = query_engine.decomposed_search(g, fake_llm, "alpha beta gamma delta")
        assert out.count() > 0
        assert "Decompose" in prompts[0]

    def test_decomposed_search_falls_back_to_query(self, g):
        out = query_engine.decomposed_search(g, lambda p: "", "alpha beta")
        assert out.count() > 0


class TestCrossEncoderRerank:
    @pytest.fixture(scope="class")
    def stmts(self, spark):
        return spark.createDataFrame(
            [
                {"id": 1, "value": "spark joins tables with hash partitioning"},
                {"id": 2, "value": "completely unrelated cooking recipe text"},
                {"id": 3, "value": "spark shuffles data between partitions"},
            ]
        )

    def test_scores_monotone_in_overlap(self, stmts):
        out = rerank.cross_encoder_rerank(
            stmts, "spark partitions", text_col="value"
        ).collect()
        by_id = {r["id"]: r["rerank_score"] for r in out}
        assert by_id[3] > by_id[2]
        assert by_id[1] > by_id[2]

    def test_schema_preserved_plus_score(self, stmts):
        out = rerank.cross_encoder_rerank(stmts, "q", text_col="value")
        assert out.columns == ["id", "value", "rerank_score"]

    def test_rerank_and_truncate_total_order(self, stmts):
        out = rerank.rerank_and_truncate(
            stmts, "spark partitions", id_col="id", top_k=2
        ).collect()
        assert [r["id"] for r in out] == [3, 1]

    def test_batching_covers_all_rows(self, spark):
        df = spark.createDataFrame(
            [{"id": i, "value": f"text {i}"} for i in range(200)]
        )
        out = rerank.cross_encoder_rerank(df, "text", batch_size=16)
        assert out.count() == 200
