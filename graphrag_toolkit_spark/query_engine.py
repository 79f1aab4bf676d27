"""Minimum-slice traversal-based retrieval (SURVEY.md §7 step 4; lifecycle
§3.2 stages 5b-7 collapsed into one DataFrame DAG).

Pipeline, matching the reference's query flow without any LLM/service stage:

  chunk VSS seeds (V1+V3, exact cosine + diversity)
    → J1 chunk→statements
    → J2/J3/A2 scored statement context
    → processor chain: dedup (A5) → tfidf rerank (V5) → prune (T5)
      → rescore (A6) → truncate per topic (T2) → truncate results (T3)
    → nested SearchResult rows (A1)

Fully deterministic — the correctness suite runs it against golden
brute-force oracles; no model in the loop (keyword/entity providers in
passthru mode, reference ``processor_args.py:81-82``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from graphrag_toolkit_spark.fixtures import SparkGraphTables, pseudo_embedding
from graphrag_toolkit_spark.operators import processors as P
from graphrag_toolkit_spark.operators.rollup import nest_results, scored_statement_context
from graphrag_toolkit_spark.operators.tfidf import rerank_by_tfidf
from graphrag_toolkit_spark.operators.traversal import chunk_to_statements
from graphrag_toolkit_spark.operators.vss import top_k_with_diversity


@dataclass
class RetrievalConfig:
    """Work-bounding defaults mirroring ``processor_args.py:58-116``."""

    vss_top_k: int = 10
    vss_diversity_factor: int = 5
    intermediate_limit: int = 50
    max_search_results: int = 5
    max_statements_per_topic: int = 10
    prune_factor: float = 0.05
    tfidf_alpha: float = 1.0
    extra: dict = field(default_factory=dict)


def chunk_search_flat(
    g: SparkGraphTables,
    query_text: str,
    config: RetrievalConfig | None = None,
    query_vector: list[float] | None = None,
) -> DataFrame:
    """The retrieval core as FLAT scored statement rows (stages 5b-6 of
    §3.2), before nested assembly — the unit that composite retrieval unions."""
    cfg = config or RetrievalConfig()
    qvec = query_vector or pseudo_embedding(query_text)

    # V1+V3 — seeds with per-source diversity
    emb = g.embeddings_chunk.join(
        g.chunks.select("chunk_id", "source_id"),
        g.embeddings_chunk.id == g.chunks.chunk_id,
    )
    seeds = top_k_with_diversity(
        emb, qvec, id_col="chunk_id", vec_col="embedding",
        group_col="source_id", top_k=cfg.vss_top_k,
        diversity_factor=cfg.vss_diversity_factor,
    ).select("chunk_id")

    # J1 → J2/J3/A2
    stmt_ids = chunk_to_statements(g, seeds, limit=cfg.intermediate_limit)
    flat = scored_statement_context(g, stmt_ids)

    # processor chain (flat rows; see processors.py)
    flat = P.dedup_results(flat)
    flat = rerank_by_tfidf(flat, query_text, alpha=cfg.tfidf_alpha)
    flat = P.prune_statements(cfg.prune_factor)(flat)
    flat = P.rescore_results(flat)
    flat = P.truncate_statements(cfg.max_statements_per_topic)(flat)
    flat = P.truncate_results(cfg.max_search_results)(flat)
    return flat


def chunk_based_search(
    g: SparkGraphTables,
    query_text: str,
    config: RetrievalConfig | None = None,
    query_vector: list[float] | None = None,
) -> DataFrame:
    """End-to-end chunk-based traversal search → nested SearchResult rows."""
    cfg = config or RetrievalConfig()
    flat = chunk_search_flat(g, query_text, cfg, query_vector)
    # A1 — nested assembly
    return nest_results(flat.drop("result_score"), max_results=cfg.max_search_results)


def composite_search(
    g: SparkGraphTables,
    branches: list[tuple[str, float]],
    config: RetrievalConfig | None = None,
) -> DataFrame:
    """T8 + §3.2 stage 4: weighted union of per-query retrieval branches.
    The reference fans retrievers out over a thread pool and merges; here
    every branch is a sub-DAG of ONE plan — `union` → shared dedup (scores
    sum across branches) → rescore/truncate → nested rows. Reference:
    ``composite_traversal_based_retriever.py:128-205``."""
    cfg = config or RetrievalConfig()
    flats = [
        (chunk_search_flat(g, q, cfg).drop("result_score"), w) for q, w in branches
    ]
    merged = P.union_weighted(flats)
    merged = P.dedup_results(merged)
    merged = P.rescore_results(merged)
    merged = P.truncate_statements(cfg.max_statements_per_topic)(merged)
    merged = P.truncate_results(cfg.max_search_results)(merged)
    return nest_results(
        merged.drop("result_score"), max_results=cfg.max_search_results
    )


def decomposed_search(
    g: SparkGraphTables,
    llm,
    query_text: str,
    config: RetrievalConfig | None = None,
    max_subqueries: int = 2,
) -> DataFrame:
    """§3.2 stages 2-3: LLM query decomposition → composite retrieval.
    ``llm(prompt) -> str`` returns newline-separated subqueries (≤ 2 in the
    reference, ``retrieval/utils/query_decomposition.py``); falls back to the
    original query when the LLM returns nothing. Equal branch weights."""
    reply = llm(f"Decompose into at most {max_subqueries} subqueries:\n{query_text}")
    subs = [s.strip() for s in reply.splitlines() if s.strip()][:max_subqueries]
    if not subs:
        subs = [query_text]
    return composite_search(g, [(s, 1.0) for s in subs], config)
