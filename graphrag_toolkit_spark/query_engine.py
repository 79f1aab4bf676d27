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


def chunk_based_search(
    g: SparkGraphTables,
    query_text: str,
    config: RetrievalConfig | None = None,
    query_vector: list[float] | None = None,
) -> DataFrame:
    """End-to-end chunk-based traversal search → nested SearchResult rows."""
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

    # A1 — nested assembly
    return nest_results(flat.drop("result_score"), max_results=cfg.max_search_results)
