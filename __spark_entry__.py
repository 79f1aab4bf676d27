"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship semantic-search pipeline at sf0.001.
``queries()`` / ``oracle_sql()`` — the declared operator workload from
``graphrag_toolkit_spark.workload`` (one entry per implemented operator from
SURVEY.md §2), checked against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: VSS top-k with diversity re-sampling (SURVEY V1+V3) joined to
    source documents — the retrieval core's seed stage, end-to-end."""
    from graphrag_toolkit_spark.operators.vss import top_k_with_diversity
    from graphrag_toolkit_spark.session import load

    emb = load(spark, SF0001, "embeddings")
    docs = load(spark, SF0001, "documents")
    # Deterministic query vector: the embedding of vec_id 0.
    qvec = emb.filter("vec_id = 0").select("embedding").head()[0]
    hits = top_k_with_diversity(
        emb,
        query_vector=qvec,
        id_col="vec_id",
        vec_col="embedding",
        group_col="label",
        top_k=10,
        diversity_factor=5,
    )
    return hits.join(docs, hits.vec_id == docs.doc_id).select(
        "vec_id", "score", "label", "lang", "source", "n_chars"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graphrag_toolkit_spark.workload import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from graphrag_toolkit_spark.workload import all_oracles

    return all_oracles()
