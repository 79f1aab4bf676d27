"""Vector-similarity-search operators (SURVEY.md §2.5 V1-V4).

Parity targets:
- V1/V2 top-k: ``storage/vector/vector_index.py:128-153`` (interface) and
  ``retrieval/utils/statement_utils.py:15-95`` (exact in-memory cosine) —
  here: a codegen'd cosine column expression over the embeddings table +
  ``row_number`` with a total order (score desc, id asc), no UDF, no collect.
- V3 diversity re-sample: ``retrieval/utils/vector_utils.py:109-172`` —
  the reference over-fetches ``top_k × diversity_factor`` then round-robins
  one hit per source until k are taken. The exact queue rotation is
  reproduced by ordering on (per-group rank, score desc): rank-1 rows of all
  groups come first (best of each source), then rank-2, etc.

Scale notes: the scoring scan is embarrassingly parallel (no shuffle until the
final top-k, which AQE executes as a TakeOrdered — no full sort). At 100 TB
the same expression is the exact-rerank leg behind the IVF/LSH candidate
generators in ``operators/ann.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_quantized,
)


def query_vector_lit(vec: Sequence[float]) -> Column:
    """A query vector as a literal array<double> column (broadcast to tasks
    inside the plan — no driver-side loop)."""
    return F.array(*[F.lit(float(x)) for x in vec])


def score_against(
    df: DataFrame, query_vector: Sequence[float], vec_col: str = "embedding",
    quantized: bool = False,
) -> DataFrame:
    """Append a cosine ``score`` column against a fixed query vector.
    ``quantized`` uses the decimal-exact cosine (oracle-reproducible)."""
    fn = cosine_similarity_quantized if quantized else cosine_similarity
    return df.withColumn("score", fn(F.col(vec_col), query_vector_lit(query_vector)))


def top_k(
    df: DataFrame,
    query_vector: Sequence[float],
    id_col: str = "id",
    vec_col: str = "embedding",
    k: int = 10,
    pre_filter: Column | None = None,
    quantized: bool = False,
) -> DataFrame:
    """Exact brute-force cosine top-k with deterministic tie-break (V1/V2).

    ``pre_filter`` is the metadata filter pushed below the scoring scan —
    mirroring the reference's filtered kNN (filter first, then score)."""
    scored = df if pre_filter is None else df.filter(pre_filter)
    scored = score_against(scored, query_vector, vec_col, quantized=quantized)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def top_k_with_diversity(
    df: DataFrame,
    query_vector: Sequence[float],
    id_col: str = "id",
    vec_col: str = "embedding",
    group_col: str = "source_id",
    top_k: int = 10,
    diversity_factor: int = 5,
    pre_filter: Column | None = None,
    quantized: bool = False,
) -> DataFrame:
    """V1 + V3: over-fetch ``top_k × diversity_factor``, then round-robin one
    hit per ``group_col`` value (best-first) until ``top_k`` are taken."""
    overfetch = df if pre_filter is None else df.filter(pre_filter)
    overfetch = (
        score_against(overfetch, query_vector, vec_col, quantized=quantized)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(top_k * diversity_factor)
    )
    rr = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        overfetch.withColumn("rr_rank", F.row_number().over(rr))
        .orderBy(F.asc("rr_rank"), F.desc("score"), F.asc(id_col))
        .limit(top_k)
        .drop("rr_rank")
    )


def fetch_embeddings(embeddings: DataFrame, ids_df: DataFrame, id_col: str = "id") -> DataFrame:
    """V4 batched embedding fetch: semi-join style lookup (replaces the
    reference's SharedEmbeddingCache LRU — a broadcast hash join is the
    distributed cache)."""
    return embeddings.join(F.broadcast(ids_df.select(id_col).distinct()), id_col)
