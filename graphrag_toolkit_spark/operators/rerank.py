"""Cross-encoder reranking plumbing (SURVEY §2.5 V7).

Parity targets: ``post_processors/sentence_reranker.py:16-130`` (SentenceT
cross-encoder), ``post_processors/bge_reranker.py:23-217`` (FlagEmbedding,
GPU-batched), byokg ``graph_reranker.py:32-133`` (relation reranking).

The model is injected as ``scorer(query, texts) -> scores`` and runs inside
an Arrow-batched ``mapInPandas`` stage — batching, and in production retry/
rate-limit, live inside the UDF; the plan stays a plain projection. Model
quality is NOT under test (the reference's models are remote/GPU); the
deterministic default scorer (token-overlap Jaccard) exercises the identical
dataflow and keeps the stage oracle-testable by contract.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Scorer = Callable[[str, Sequence[str]], Sequence[float]]


def token_overlap_scorer(query: str, texts: Sequence[str]) -> list[float]:
    """Deterministic stand-in model: Jaccard overlap of lowercase token sets.
    Monotone in shared vocabulary — good enough to assert ordering contracts."""
    q = set(query.lower().split())
    out = []
    for t in texts:
        s = set(t.lower().split())
        out.append(len(q & s) / len(q | s) if q | s else 0.0)
    return out


def cross_encoder_rerank(
    df: DataFrame,
    query: str,
    text_col: str = "value",
    scorer: Scorer = token_overlap_scorer,
    batch_size: int = 64,
) -> DataFrame:
    """Append ``rerank_score`` = scorer(query, text) over Arrow batches.
    Callers order by (rerank_score desc, id asc) and truncate — kept out of
    this stage so Catalyst can fuse the sort with downstream limits."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, rerank_score double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start : start + batch_size].copy()
                chunk["rerank_score"] = list(scorer(query, list(chunk[text_col])))
                yield chunk

    return df.mapInPandas(run, schema=schema)


def rerank_and_truncate(
    df: DataFrame,
    query: str,
    id_col: str,
    text_col: str = "value",
    top_k: int = 10,
    scorer: Scorer = token_overlap_scorer,
) -> DataFrame:
    """V7 end-to-end: score → total order (score desc, id asc) → top-k."""
    scored = cross_encoder_rerank(df, query, text_col, scorer)
    return scored.orderBy(F.desc("rerank_score"), F.asc(id_col)).limit(top_k)
