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
    """Flagship: the FULL reference lifecycle in one run — §3.1 ingestion
    (documents → extraction → content-addressed lexical graph + embeddings)
    then §3.2 retrieval over the freshly-built graph (VSS seeds → traversal
    joins → processor chain → nested SearchResult rows)."""
    from graphrag_toolkit_spark import indexing, query_engine
    from graphrag_toolkit_spark.session import load

    docs = load(spark, SF0001, "documents")
    g = indexing.to_graph_tables(indexing.extract_and_build(docs), embed_dim=32)
    return query_engine.chunk_based_search(g, "spark filter join window batch stream")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graphrag_toolkit_spark.workload import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from graphrag_toolkit_spark.workload import all_oracles

    return all_oracles()
