"""VSS operators: exact top-k, tie-breaks, diversity round-robin (V1-V4)."""

from __future__ import annotations

import math

import pytest

from graphrag_toolkit_spark.operators.vss import (
    fetch_embeddings,
    top_k,
    top_k_with_diversity,
)


def make_emb(spark, rows):
    return spark.createDataFrame(
        [{"id": i, "embedding": v, "source_id": s} for i, v, s in rows]
    )


def test_top_k_exact_ranking(spark):
    q = [1.0, 0.0]
    rows = [
        ("a", [1.0, 0.0], "s1"),      # cos 1.0
        ("b", [1.0, 1.0], "s1"),      # cos ~0.707
        ("c", [0.0, 1.0], "s2"),      # cos 0.0
        ("d", [0.9, 0.1], "s2"),      # cos ~0.994
    ]
    out = top_k(make_emb(spark, rows), q, id_col="id", k=3).collect()
    assert [r["id"] for r in out] == ["a", "d", "b"]
    assert out[0]["score"] == pytest.approx(1.0)


def test_top_k_tie_break_on_id(spark):
    q = [1.0, 0.0]
    rows = [("z", [2.0, 0.0], "s1"), ("a", [3.0, 0.0], "s1"), ("m", [0.0, 1.0], "s2")]
    out = top_k(make_emb(spark, rows), q, id_col="id", k=2).collect()
    # both a and z score exactly 1.0 → id asc breaks the tie
    assert [r["id"] for r in out] == ["a", "z"]


def test_diversity_round_robin_one_per_source_first(spark):
    q = [1.0, 0.0]
    # s1 has the 3 best hits; diversity must still surface s2's best in slot 2
    rows = [
        ("a", [1.0, 0.0], "s1"),
        ("b", [0.99, 0.1], "s1"),
        ("c", [0.98, 0.15], "s1"),
        ("d", [0.5, 0.5], "s2"),
    ]
    out = top_k_with_diversity(
        make_emb(spark, rows), q, id_col="id", group_col="source_id",
        top_k=3, diversity_factor=2,
    ).collect()
    ids_ = [r["id"] for r in out]
    assert ids_[0] == "a"          # best overall, rank 1 in s1
    assert ids_[1] == "d"          # rank 1 in s2 beats rank 2 in s1
    assert ids_[2] == "b"          # then back to s1's rank 2
    for prev, cur in zip(out, out[1:]):
        # within the result, ordering is (round, score desc)
        assert prev["score"] >= cur["score"] or prev["source_id"] != cur["source_id"]


def test_diversity_overfetch_bounds_pool(spark):
    q = [1.0, 0.0]
    rows = [(f"i{n:02d}", [1.0 - n * 0.01, n * 0.01], f"s{n % 3}") for n in range(20)]
    out = top_k_with_diversity(
        make_emb(spark, rows), q, id_col="id", group_col="source_id",
        top_k=5, diversity_factor=1,
    ).collect()
    assert len(out) == 5


def test_fetch_embeddings_semi_join(spark):
    emb = make_emb(spark, [("a", [1.0], "s"), ("b", [2.0], "s"), ("c", [3.0], "s")])
    wanted = spark.createDataFrame([{"id": "a"}, {"id": "c"}, {"id": "c"}])
    out = fetch_embeddings(emb, wanted, id_col="id").orderBy("id").collect()
    assert [r["id"] for r in out] == ["a", "c"]


def test_scores_are_cosine(spark):
    q = [3.0, 4.0]
    rows = [("a", [6.0, 8.0], "s1"), ("b", [4.0, 3.0], "s1")]
    out = {r["id"]: r["score"] for r in top_k(make_emb(spark, rows), q, id_col="id", k=2).collect()}
    assert out["a"] == pytest.approx(1.0)
    assert out["b"] == pytest.approx((12 + 12) / (5 * 5))


class TestRankingEval:
    def test_perfect_and_degraded_rankings(self, spark):
        from graphrag_toolkit_spark.operators.ranking_eval import ranking_metrics

        judgments = spark.createDataFrame(
            [("q", 1, 1), ("q", 2, 1)], "query_id string, doc_id long, rel int"
        )
        perfect = spark.createDataFrame(
            [("q", 1, 1), ("q", 2, 2), ("q", 9, 3)],
            "query_id string, doc_id long, rank int",
        )
        m = ranking_metrics(perfect, judgments, k=3).collect()[0]
        assert m["ndcg"] == 1.0 and m["mrr"] == 1.0 and m["recall"] == 1.0

        degraded = spark.createDataFrame(
            [("q", 9, 1), ("q", 8, 2), ("q", 1, 3)],
            "query_id string, doc_id long, rank int",
        )
        d = ranking_metrics(degraded, judgments, k=3).collect()[0]
        assert 0.0 < d["ndcg"] < 1.0
        assert d["mrr"] == 1.0 / 3
        assert d["recall"] == 0.5          # found 1 of 2 relevant
        assert d["n_relevant"] == 2 and d["n_retrieved_relevant"] == 1

    def test_zero_result_query_appears_zeroed(self, spark):
        """A judged query with NO retrieved rows inside top-k must still show
        up with all-zero metrics, not vanish (macro-average integrity)."""
        from graphrag_toolkit_spark.operators.ranking_eval import ranking_metrics

        judgments = spark.createDataFrame(
            [("q1", 1, 2), ("q2", 7, 1), ("q2", 8, 1)],
            "query_id string, doc_id long, rel int",
        )
        results = spark.createDataFrame(  # only q1 retrieved anything
            [("q1", 1, 1)], "query_id string, doc_id long, rank int"
        )
        out = {r["query_id"]: r for r in ranking_metrics(results, judgments, k=3).collect()}
        assert set(out) == {"q1", "q2"}
        z = out["q2"]
        assert z["dcg"] == 0.0 and z["ndcg"] == 0.0 and z["mrr"] == 0.0
        assert z["recall"] == 0.0 and z["n_retrieved_relevant"] == 0
        assert z["n_relevant"] == 2 and z["idcg"] > 0.0

    def test_no_relevant_judged(self, spark):
        from graphrag_toolkit_spark.operators.ranking_eval import ranking_metrics

        judgments = spark.createDataFrame(
            [], "query_id string, doc_id long, rel int"
        )
        res = spark.createDataFrame(
            [("q", 1, 1)], "query_id string, doc_id long, rank int"
        )
        m = ranking_metrics(res, judgments, k=5).collect()[0]
        assert m["ndcg"] == 0.0 and m["mrr"] == 0.0 and m["recall"] == 0.0
