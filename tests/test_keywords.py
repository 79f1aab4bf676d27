"""Keyword provider matrix (§2.10) + multipart query-mode routing.

Reference parity: traversal_based_base_retriever.py:219-257 (provider
switch), keyword_nlp_provider.py:31-36 (NER-shaped extraction),
keyword_provider.py:45-81 ('^'-separated LLM keywords),
query_mode_retriever.py:27-68 (multipart branch scaling).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark import fixtures, keywords
from graphrag_toolkit_spark.query_engine import (
    RetrievalConfig,
    chunk_search_flat,
    multipart_search,
    query_mode,
)


@pytest.fixture(scope="module")
def g(spark):
    return fixtures.generate("t1", seed=42).to_spark(spark)


SAMPLES = [
    "What did Barack Obama say about Climate Change in New York?",
    "the quick brown fox",                      # no capitals at all
    "Where is Paris and where is Paris Texas?",  # overlapping surface forms
    "A An The It",                               # only stopwords
    "",
]


class TestNlpProvider:
    def test_python_and_column_twins_agree(self, spark):
        df = spark.createDataFrame(
            [{"id": i, "text": t} for i, t in enumerate(SAMPLES)]
        )
        rows = keywords.nlp_keywords(df, "text", "id").collect()
        by_id: dict[int, list[str]] = {}
        for r in sorted(rows, key=lambda r: (r["id"], r["pos"])):
            by_id.setdefault(r["id"], []).append(r["keyword"])
        for i, t in enumerate(SAMPLES):
            assert by_id.get(i, []) == keywords.nlp_keywords_py(t), t

    def test_extraction_semantics(self):
        kws = keywords.nlp_keywords_py(
            "What did Barack Obama say about Climate Change in New York?"
        )
        # question word filtered; capitalized runs kept whole, in order
        assert kws == ["Barack Obama", "Climate Change", "New York"]

    def test_case_insensitive_first_form_dedup(self):
        assert keywords.nlp_keywords_py("NASA visited Nasa and NASA") == ["NASA"]

    def test_stopword_only_and_empty(self):
        assert keywords.nlp_keywords_py("A An The It") == []
        assert keywords.nlp_keywords_py("") == []


class TestProviderMatrix:
    def test_passthru_and_vss_return_query(self):
        for mode in ("passthru", "vss"):
            assert keywords.get_keywords(mode, "some query") == ["some query"]

    def test_llm_split_and_dedup(self):
        fake = lambda prompt: "Spark ^ catalyst^ spark ^ AQE ^"
        assert keywords.get_keywords("llm", "q", llm=fake) == [
            "spark", "catalyst", "aqe"
        ]

    def test_llm_requires_callable(self):
        with pytest.raises(ValueError, match="llm"):
            keywords.get_keywords("llm", "q")

    def test_invalid_mode(self):
        with pytest.raises(ValueError, match="passthru"):
            keywords.get_keywords("bogus", "q")


class TestKeywordSeededSearch:
    def test_nlp_provider_runs_end_to_end(self, g):
        # entity values in the fixture graph are capitalized-ish word salads;
        # the run extraction may or may not hit one — the contract is that
        # the seed union path executes and returns the usual flat schema
        flat = chunk_search_flat(
            g, "What about Alpha Beta?", keyword_provider="nlp"
        )
        rows = flat.collect()
        assert {"source_id", "statement_id", "score"} <= set(flat.columns)
        assert len(rows) > 0

    def test_passthru_identical_to_default(self, g):
        base = chunk_search_flat(g, "query text").collect()
        thru = chunk_search_flat(g, "query text", keyword_provider="passthru").collect()
        assert sorted(map(str, base)) == sorted(map(str, thru))


class TestMultipartRouting:
    def test_query_mode_parses_reply(self):
        assert query_mode(lambda p: " Single ", "q") == "simple"
        assert query_mode(lambda p: "multipart", "q") == "complex"
        assert query_mode(lambda p: "no idea", "q") == "complex"

    def test_simple_mode_single_branch_full_budget(self, g):
        calls: list[tuple[str, int]] = []

        def fake_llm(prompt: str) -> str:
            return "single"

        def spy(g_, q_, cfg_):
            calls.append((q_, cfg_.max_search_results))
            return chunk_search_flat(g_, q_, cfg_)

        out = multipart_search(g, fake_llm, "one question", retriever_fn=spy)
        assert out.count() >= 0
        assert calls == [("one question", RetrievalConfig().max_search_results)]

    def test_complex_mode_scales_branch_budget(self, g):
        """Reference query_mode_retriever.py:55-57: per-branch
        max_search_results = int(max/len(keywords)) + 1, passthru provider."""
        calls: list[tuple[str, int, str]] = []

        def fake_llm(prompt: str) -> str:
            if "single or multipart" in prompt:
                return "multipart"
            return "alpha^beta^gamma"

        def spy(g_, q_, cfg_):
            calls.append(
                (q_, cfg_.max_search_results, cfg_.extra.get("keyword_provider"))
            )
            return chunk_search_flat(g_, q_, cfg_)

        cfg = RetrievalConfig(max_search_results=5)
        out = multipart_search(g, fake_llm, "a and b and c", config=cfg, retriever_fn=spy)
        assert out.count() >= 0
        assert [c[0] for c in calls] == ["alpha", "beta", "gamma"]
        assert all(c[1] == int(5 / 3) + 1 for c in calls)      # == 2
        assert all(c[2] == "passthru" for c in calls)

    def test_multipart_disabled_skips_mode_probe(self, g):
        def exploding_llm(prompt: str) -> str:
            raise AssertionError("LLM must not be called when disabled")

        out = multipart_search(
            g, exploding_llm, "q", enable_multipart=False
        )
        assert out.count() >= 0


class TestEntityVssProvider:
    """ec_entity_provider='vss' (entity_vss_provider.py:24-110): entities
    reachable from the query's top chunks, degree-ranked, local excluded."""

    def test_vss_entities_degree_ranked_and_bounded(self, spark, g):
        from graphrag_toolkit_spark.operators.entity import vss_entities

        # query WITH the embedding of a chunk that provably has statements
        # (the sparse t1 fixture links only some chunks) — VSS rank 1 is then
        # that chunk itself, so the walk must reach its entities
        linked_chunk = g.edges_of("MENTIONED_IN_S").select("dst").first()["dst"]
        qv = list(
            g.embeddings_chunk.filter(F.col("id") == linked_chunk)
            .select("embedding").first()["embedding"]
        )
        out = vss_entities(g, qv, index="chunk", top_k_nodes=3, limit=10).collect()
        assert 0 < len(out) <= 10
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)
        assert all(r["classification"] != "__Local_Entity__" for r in out)

    def test_topic_index_leg(self, spark, g):
        from graphrag_toolkit_spark.operators.entity import vss_entities

        qv = fixtures.pseudo_embedding("topic probe")
        out = vss_entities(g, qv, index="topic", top_k_nodes=2, limit=5).collect()
        assert len(out) <= 5

    def test_search_with_vss_entity_provider_runs(self, g):
        flat = chunk_search_flat(g, "anything at all", entity_provider="vss")
        assert flat.count() > 0

    def test_invalid_entity_provider(self, g):
        with pytest.raises(ValueError, match="entity provider"):
            chunk_search_flat(g, "q", entity_provider="bogus")


class TestTopStatementEntityProvider:
    """entity_from_top_statement_provider.py: VSS nodes -> statements ->
    TF-IDF top-1 statement -> its entities, degree-ranked."""

    def test_entities_come_from_one_statement(self, spark, g):
        from graphrag_toolkit_spark.operators.entity import (
            entities_from_top_statement,
        )

        row = (
            g.edges_of("MENTIONED_IN_S")
            .select("src", "dst")
            .join(
                g.statements.select(
                    F.col("statement_id").alias("src"),
                    F.col("value").alias("stmt_text"),
                ),
                "src",
            )
            .first()
        )
        qv = list(
            g.embeddings_chunk.filter(F.col("id") == row["dst"])
            .select("embedding").first()["embedding"]
        )
        out = entities_from_top_statement(g, row["stmt_text"], qv).collect()
        assert len(out) > 0
        scores = [r["score"] for r in out]
        assert scores == sorted(scores, reverse=True)
        assert all(r["classification"] != "__Local_Entity__" for r in out)
