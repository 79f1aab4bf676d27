"""Top-level façade (api.py): the reference's entry-point classes wired over
the DataFrame operators — a reference user's calling code should port 1:1."""

from __future__ import annotations

import pytest

from graphrag_toolkit_spark.api import (
    ByoKGQueryEngine,
    LexicalGraphIndex,
    LexicalGraphQueryEngine,
    Response,
)

DOCS = [
    {"doc_id": 1, "lang": "en", "source": "a",
     "text": "alpha engine merges tables fast under heavy load"},
    {"doc_id": 2, "lang": "en", "source": "b",
     "text": "beta stream joins windows slowly while reading events"},
    {"doc_id": 3, "lang": "en", "source": "a",
     "text": "gamma scans filter tables daily before nightly loads gamma writes output partitions hourly after compaction finishes"},
]


@pytest.fixture(scope="module")
def graph(spark):
    docs = spark.createDataFrame(DOCS)
    return LexicalGraphIndex(embed_dim=16).extract_and_build(docs)


class TestLexicalGraphIndex:
    def test_extract_then_build_equals_fused(self, spark, graph):
        docs = spark.createDataFrame(DOCS)
        idx = LexicalGraphIndex(embed_dim=16)
        staged = idx.extract(docs)
        assert set(staged) >= {
            "sources", "chunks", "topics", "statements", "facts", "entities",
            "edges",
        }
        g2 = idx.build(staged)
        assert sorted(r["statement_id"] for r in g2.statements.collect()) == sorted(
            r["statement_id"] for r in graph.statements.collect()
        )

    def test_batch_inference_staging_roundtrip(self, spark, tmp_path):
        """Bedrock batch-inference lifecycle mirror (reference
        ``indexing/extract/batch_extractor_base.py`` +
        ``batch_inference_utils.py``): extraction output leaves the
        cluster as staged JSONL (the S3 ship-out), comes back, and build
        RESUMES from the staged frame — the resulting graph must equal
        the fused ``extract_and_build`` on every table. Extends the
        extract-then-build ≡ fused equivalence across the durable staging
        boundary (JSON round-trip included)."""
        from graphrag_toolkit_spark import indexing
        from graphrag_toolkit_spark.sources import readers

        docs = spark.createDataFrame(DOCS)
        stmts = indexing.rule_extract_statements(indexing.docs_to_chunks(docs))
        out = str(tmp_path / "staged_statements")
        readers.write_staged(stmts, out)
        staged = readers.read_staged(spark, out)
        resumed = indexing.extract_and_build(docs, extractor=lambda _chunks: staged)
        fused = indexing.extract_and_build(docs)
        for table in ("statements", "facts", "entities", "edges"):
            cols = sorted(fused[table].columns)
            a = sorted(map(str, resumed[table].select(cols).collect()))
            b = sorted(map(str, fused[table].select(cols).collect()))
            assert a == b and a, table

    def test_build_filters_pass_through(self, spark):
        docs = spark.createDataFrame(DOCS)
        idx = LexicalGraphIndex(embed_dim=16, ignore_statements_matching="gamma")
        g = idx.extract_and_build(docs)
        assert not [
            r for r in g.statements.collect() if "gamma" in r["value"]
        ]


class TestLexicalGraphQueryEngine:
    def test_traversal_retrieve_returns_nested_rows(self, graph):
        eng = LexicalGraphQueryEngine.for_traversal_based_search(graph)
        rows = eng.retrieve("tables merge engine").collect()
        assert rows
        assert {"source_id", "score", "topics"} <= set(rows[0].asDict())

    def test_query_returns_response_with_timing(self, graph):
        eng = LexicalGraphQueryEngine.for_traversal_based_search(graph)
        resp = eng.query("tables merge engine")
        assert isinstance(resp, Response)
        # default LLM echoes the context: statement text must flow through
        assert resp.response
        assert {"retrieve_ms", "answer_ms", "total_ms", "num_results"} <= set(
            resp.metadata
        )
        assert resp.metadata["num_results"] == len(resp.results.collect())

    def test_query_injected_llm_sees_question_and_context(self, graph):
        prompts: list[str] = []

        def llm(p: str) -> str:
            prompts.append(p)
            return "ANSWER"

        eng = LexicalGraphQueryEngine.for_traversal_based_search(graph, llm=llm)
        resp = eng.query("tables merge engine")
        assert resp.response == "ANSWER"
        assert "<question>" in prompts[0] and "<context>" in prompts[0]

    def test_semantic_guided_retrieve(self, graph):
        eng = LexicalGraphQueryEngine.for_semantic_guided_search(
            graph, beam_width=5, max_depth=2
        )
        rows = eng.retrieve("tables merge engine").collect()
        assert rows
        assert {"source_id", "score", "topics"} <= set(rows[0].asDict())


class TestByoKGQueryEngine:
    @pytest.fixture(scope="class")
    def kg(self, spark):
        triples = spark.createDataFrame(
            [("paris", "capital_of", "france"), ("berlin", "capital_of", "germany")],
            ["src", "rel", "dst"],
        )
        names = spark.createDataFrame(
            [{"node_id": "paris", "name": "Paris"},
             {"node_id": "france", "name": "France"}]
        )
        return triples, names

    def test_query_round_trip(self, kg):
        triples, names = kg
        calls: list[str] = []

        def llm(p: str) -> str:
            calls.append(p)
            if "<context>" in p:
                return "France"           # answer generation
            if "capital_of" in p:
                return "FINISH"           # loop saw its context → stop
            return "Paris"                # first round: propose the mention

        eng = ByoKGQueryEngine(triples, names, llm)
        answer, context = eng.query("What is Paris the capital of?")
        assert answer == "France"
        lines = [r["context"] for r in context.collect()]
        assert any("capital_of" in line for line in lines)
        # final call is generation over the accumulated context
        assert "<context>" in calls[-1]


class TestCorpusPipeline:
    def test_stages_compose_and_report(self, spark):
        from graphrag_toolkit_spark.api import CorpusPipeline

        docs = spark.createDataFrame(
            [{"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog again"},
             {"doc_id": 2, "text": "the quick brown fox jumps over the lazy dog again"},
             {"doc_id": 3, "text": "x"},  # fails quality gate (min_words)
             {"doc_id": 4, "text": "a completely different sentence about engines and pipelines"}]
        )
        evals = spark.createDataFrame(
            [{"doc_id": 99,
              "text": "a completely different sentence about engines and pipelines"}]
        )
        pipe = (
            CorpusPipeline()
            .with_quality_gate({"min_words": 5})
            .with_exact_dedup()
            .with_decontamination(evals, n=4)
            .with_split()
        )
        out = pipe.run(docs)
        rows = {r["doc_id"]: r for r in out.collect()}
        # 3 gated out, 2 deduped into 1, 4 decontaminated away -> doc 1 left
        assert set(rows) == {1}
        assert rows[1]["split"] in ("train", "val", "test")
        report = pipe.report(docs)
        assert [r["stage"] for r in report] == [
            "input", "quality_gate", "exact_dedup", "decontaminate", "split"
        ]
        assert [r["rows"] for r in report] == [4, 3, 2, 1, 1]

    def test_single_lineage(self, spark):
        """run() is lazy end to end: one DataFrame, no mid-pipeline
        materialization (localCheckpoint/persist) in the returned plan."""
        from graphrag_toolkit_spark.api import CorpusPipeline

        docs = spark.createDataFrame(
            [{"doc_id": n, "text": f"document number {n} with several words"}
             for n in range(20)]
        )
        out = (
            CorpusPipeline().with_quality_gate().with_exact_dedup().with_split()
            .run(docs)
        )
        assert out.count() == 20  # nothing dropped; plan executes fine


class TestCorpusPipelineRound5Stages:
    def test_dsir_selection_keeps_target_like_half(self, spark):
        from graphrag_toolkit_spark.api import CorpusPipeline

        corpus = spark.createDataFrame(
            [{"doc_id": i, "text": "physics maths theorem proofs lemma"}
             for i in range(10)]
            + [{"doc_id": 100 + i, "text": "gossip celebrity news rumors scandal"}
               for i in range(10)]
        )
        target = spark.createDataFrame(
            [{"doc_id": 999, "text": "physics theorem lemma corollary"}]
        )
        out = (
            CorpusPipeline()
            .with_dsir_selection(target, keep_fraction=0.5)
            .run(corpus)
        )
        ids = {r["doc_id"] for r in out.collect()}
        assert ids == set(range(10))  # the physics half survives

    def test_mixture_weights_append_column(self, spark):
        from graphrag_toolkit_spark.api import CorpusPipeline

        corpus = spark.createDataFrame(
            [{"doc_id": i, "text": "x", "lang": "en" if i % 4 else "de",
              "source": f"s{i % 2}"} for i in range(40)]
        )
        out = (
            CorpusPipeline()
            .with_mixture_weights("lang", "source")
            .run(corpus)
        )
        rows = out.collect()
        assert len(rows) == 40 and all(r["weight"] > 0 for r in rows)
        w = {(r["lang"], r["source"]): r["weight"] for r in rows}
        # rare lang up-weighted relative to the dominant one
        assert w[("de", "s0")] > w[("en", "s0")]
