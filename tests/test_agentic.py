"""byokg agentic composition (SURVEY §3.3): text-to-SparkSQL error feedback,
the B4 agentic loop, and the B5 scoring retriever — all behind deterministic
fake LLMs/scorers (the correctness suite never crosses a real model)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark import agentic

TRIPLES = [
    ("paris", "capital_of", "france"),
    ("paris", "located_in", "europe"),
    ("france", "member_of", "eu"),
    ("berlin", "capital_of", "germany"),
    ("germany", "member_of", "eu"),
]

NAMES = [
    {"node_id": "paris", "name": "Paris"},
    {"node_id": "france", "name": "France"},
    {"node_id": "berlin", "name": "Berlin"},
    {"node_id": "germany", "name": "Germany"},
]


@pytest.fixture(scope="module")
def triples(spark):
    df = spark.createDataFrame(TRIPLES, ["src", "rel", "dst"])
    agentic.register_graph_views(spark, df)
    return df


@pytest.fixture(scope="module")
def names(spark):
    return spark.createDataFrame(NAMES)


class TestSqlGeneration:
    def test_error_feedback_loop(self, spark, triples):
        calls = []

        def fake_llm(prompt: str) -> str:
            calls.append(prompt)
            if len(calls) == 1:
                return "SELECT * FROM no_such_table"
            return "SELECT dst FROM triples WHERE src = 'paris' AND rel = 'capital_of'"

        out, transcript = agentic.generate_and_run_sql(
            spark, fake_llm, "What is Paris the capital of?"
        )
        assert out is not None
        assert [r["dst"] for r in out.collect()] == ["france"]
        assert len(transcript) == 2
        # the second prompt carries the first failure back to the LLM
        assert "failed" in calls[1] and "no_such_table" in calls[1]

    def test_empty_result_feeds_back(self, spark, triples):
        def fake_llm(prompt: str) -> str:
            if "no rows" in prompt:
                return "SELECT dst FROM triples WHERE rel = 'member_of'"
            return "SELECT dst FROM triples WHERE rel = 'nonexistent_rel'"

        out, transcript = agentic.generate_and_run_sql(spark, fake_llm, "q")
        assert out is not None and out.count() == 2
        assert len(transcript) == 2

    def test_gives_up_after_max_attempts(self, spark, triples):
        out, transcript = agentic.generate_and_run_sql(
            spark, lambda p: "SELECT broken", "q", max_attempts=2
        )
        assert out is None and len(transcript) == 2


class TestQuerySafety:
    """Mirror of the reference's bypass-attack suite
    (integration-tests/.../byokg_cypher_safety.py:120-199) over Spark SQL."""

    BLOCKED = [
        "DROP TABLE triples",
        "INSERT OVERWRITE TABLE triples SELECT 1, 2, 3",
        "CREATE TABLE evil AS SELECT * FROM triples",
        "MERGE INTO triples USING t ON 1=1 WHEN MATCHED THEN DELETE",
        "SET spark.sql.shuffle.partitions=1",
        "CACHE TABLE triples",
        "delete from triples",                         # lowercase
        "SELECT 1; DROP TABLE triples",                # piggyback
    ]

    def test_blocked_keywords(self):
        for q in self.BLOCKED:
            assert not agentic.is_query_safe(q), q

    def test_comment_bypass_blocked(self):
        # keyword split by an inline comment reassembles after stripping
        assert not agentic.is_query_safe("DR/**/OP TABLE triples")
        # keyword hidden *inside* a comment is harmless and allowed
        assert agentic.is_query_safe("SELECT /* not a DROP */ 1")
        assert agentic.is_query_safe("SELECT 1 -- DROP TABLE x")

    def test_unicode_fullwidth_bypass_blocked(self):
        fullwidth = "".join(
            chr(ord(c) + 0xFEE0) if c.isalpha() else c for c in "DROP"
        )
        assert not agentic.is_query_safe(f"{fullwidth} TABLE triples")

    def test_word_boundary_not_substring(self):
        # column/identifier names containing a keyword are fine
        assert agentic.is_query_safe("SELECT created_at, dataset FROM triples")
        assert agentic.is_query_safe("SELECT * FROM updates")

    def test_flag_off_passthrough(self):
        assert agentic.is_query_safe("DROP TABLE triples", block_modification=False)

    def test_malicious_generated_query_never_executes(self, spark, triples):
        """A generated DROP is rejected pre-execution; the view survives and
        the rejection feeds back into the next prompt."""
        calls = []

        def evil_then_good(prompt: str) -> str:
            calls.append(prompt)
            if len(calls) == 1:
                return "DROP TABLE triples"
            return "SELECT dst FROM triples WHERE src = 'paris' AND rel = 'capital_of'"

        out, transcript = agentic.generate_and_run_sql(spark, evil_then_good, "q")
        assert out is not None and out.count() == 1
        assert "rejected" in calls[1]
        assert spark.sql("SELECT COUNT(*) AS n FROM triples").collect()[0]["n"] == 5

    def test_flag_off_executes_unchecked(self, spark, triples):
        # SET is in the block list but harmless to actually run — proves the
        # flag routes around the guard (the reference's flag-off leg).
        out, _ = agentic.generate_and_run_sql(
            spark, lambda p: "SET spark.sql.ansi.enabled",
            "q", block_modification=False,
        )
        assert out is not None


class TestAgenticRetrieve:
    def test_two_rounds_then_finish(self, triples, names):
        rounds = []

        def fake_llm(prompt: str) -> str:
            rounds.append(prompt)
            if len(rounds) == 1:
                return "Paris"
            return "FINISH"

        out = agentic.agentic_retrieve(triples, names, fake_llm, "q").collect()
        texts = [r["context"] for r in sorted(out, key=lambda r: r["pos"])]
        assert texts == [
            "paris capital_of: france",
            "paris located_in: europe",
        ]
        # round-2 prompt contains the accumulated context
        assert "paris capital_of: france" in rounds[1]

    def test_stops_when_nothing_new(self, triples, names):
        out = agentic.agentic_retrieve(
            triples, names, lambda p: "Paris", "q", max_iterations=5
        )
        # second 'Paris' round adds no new lines → loop exits early
        assert out.count() == 2


class TestScoringRetrieve:
    def test_relation_prune_and_topk(self, spark, triples):
        seeds = spark.createDataFrame([{"node_id": "paris"}])
        rel_scores = spark.createDataFrame(
            [
                {"rel": "capital_of", "rel_score": 0.9},
                {"rel": "member_of", "rel_score": 0.8},
                {"rel": "located_in", "rel_score": 0.1},
            ]
        )
        out = agentic.scoring_retrieve(
            triples, seeds, rel_scores, hops=2, keep_rels=2, top_k=10
        ).collect()
        texts = [r["text"] for r in out]
        # located_in pruned (rank 3); 2-hop reaches france member_of eu
        assert texts == [
            "paris capital_of: france",
            "france member_of: eu",
        ]


class TestLlmCache:
    def test_second_call_hits_disk_not_model(self, tmp_path):
        from graphrag_toolkit_spark.llm_cache import cached_llm

        calls = []

        def model(prompt):
            calls.append(prompt)
            return f"reply to {prompt}"

        llm = cached_llm(model, str(tmp_path))
        assert llm("alpha") == "reply to alpha"
        assert llm("alpha") == "reply to alpha"
        assert calls == ["alpha"]                 # one real call
        assert (llm.hits, llm.misses) == (1, 1)

    def test_model_tag_partitions_cache(self, tmp_path):
        from graphrag_toolkit_spark.llm_cache import cached_llm

        a = cached_llm(lambda p: "A", str(tmp_path), model_tag="m1")
        b = cached_llm(lambda p: "B", str(tmp_path), model_tag="m2")
        assert a("same prompt") == "A"
        assert b("same prompt") == "B"

    def test_replays_across_instances(self, tmp_path):
        from graphrag_toolkit_spark.llm_cache import cached_llm

        first = cached_llm(lambda p: "original", str(tmp_path))
        first("q")

        def exploding(prompt):
            raise AssertionError("must replay from disk")

        second = cached_llm(exploding, str(tmp_path))
        assert second("q") == "original"

    def test_composes_with_agentic_loop(self, spark, tmp_path):
        """The cache slots in anywhere an LLM callable is injected — e.g.
        query-mode detection replays without re-asking."""
        from graphrag_toolkit_spark.llm_cache import cached_llm
        from graphrag_toolkit_spark.query_engine import query_mode

        calls = []
        llm = cached_llm(lambda p: (calls.append(p), "single")[1], str(tmp_path))
        assert query_mode(llm, "a question") == "simple"
        assert query_mode(llm, "a question") == "simple"
        assert len(calls) == 1


class TestPromptProviders:
    def test_static(self):
        from graphrag_toolkit_spark.prompts import provider_for

        p = provider_for("static", system_prompt="sys", user_prompt="usr $q")
        assert p.get_system_prompt() == "sys"
        assert p.get_user_prompt() == "usr $q"

    def test_file_provider_roundtrip(self, tmp_path):
        from graphrag_toolkit_spark.prompts import provider_for

        (tmp_path / "system_prompt.txt").write_text("be rigorous")
        (tmp_path / "user_prompt.txt").write_text("answer $question")
        p = provider_for("file", base_path=str(tmp_path))
        assert p.get_system_prompt() == "be rigorous"
        assert p.get_user_prompt() == "answer $question"

    def test_file_provider_missing_dir(self):
        from graphrag_toolkit_spark.prompts import provider_for

        with pytest.raises(NotADirectoryError):
            provider_for("file", base_path="/nonexistent/prompts")

    def test_spark_path_provider(self, spark, tmp_path):
        from graphrag_toolkit_spark.prompts import provider_for

        (tmp_path / "system_prompt.txt").write_text("line one\nline two")
        (tmp_path / "user_prompt.txt").write_text("u")
        p = provider_for("spark-path", spark=spark, base_path=str(tmp_path))
        assert p.get_system_prompt() == "line one\nline two"
        assert p.get_user_prompt() == "u"

    def test_render_safe_substitution(self):
        from graphrag_toolkit_spark.prompts import render

        out = render("Answer $question with $style", question="q1")
        assert out == "Answer q1 with $style"   # unknown survives verbatim

    def test_bedrock_stub_and_unknown(self):
        from graphrag_toolkit_spark.prompts import provider_for

        with pytest.raises(NotImplementedError, match="cloud SDK"):
            provider_for("bedrock")
        with pytest.raises(ValueError, match="unknown prompt provider"):
            provider_for("carrier-pigeon")
