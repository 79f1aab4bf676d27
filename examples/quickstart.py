"""Quickstart: the reference-shaped façade end-to-end on the bundled
fixtures — what a graphrag-toolkit user writes after switching engines.

    python examples/quickstart.py

1. Ingest: documents → LexicalGraphIndex.extract_and_build → node/edge/
   embedding tables (content-addressed ids; idempotent re-runs).
2. Ask: LexicalGraphQueryEngine.for_traversal_based_search → nested
   SearchResult rows and an answer Response with timing metadata.
3. KGQA: ByoKGQueryEngine over a triples table with an (injected) LLM.

No services, no credentials: the LLMs here are deterministic fakes — swap
in a real callable (prompt -> str) for production.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphrag_toolkit_spark.api import (  # noqa: E402
    ByoKGQueryEngine,
    LexicalGraphIndex,
    LexicalGraphQueryEngine,
)
from graphrag_toolkit_spark.session import build_session, load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = build_session("quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    # --- 1. ingestion -------------------------------------------------------
    docs = load(spark, SF_DIR, "documents")
    index = LexicalGraphIndex(embed_dim=32)
    graph = index.extract_and_build(docs)
    print("graph tables:", {
        n: getattr(graph, n).count()
        for n in ("sources", "chunks", "topics", "statements", "facts", "entities")
    })

    # --- 2. traversal-based retrieval --------------------------------------
    engine = LexicalGraphQueryEngine.for_traversal_based_search(graph)
    results = engine.retrieve("spark filter join window batch stream")
    print("search results:", results.count())
    results.select("source_id", "score").show(3, truncate=False)

    response = engine.query("spark filter join window batch stream")
    print("answer chars:", len(response.response),
          "| metadata:", response.metadata)

    # --- 3. byokg KGQA over a triples table ---------------------------------
    orders = load(spark, SF_DIR, "orders")
    from pyspark.sql import functions as F

    triples = orders.select(
        F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
        F.lit("placed").alias("rel"),
        F.concat(F.lit("o"), F.col("o_orderkey")).alias("dst"),
    )
    names = triples.select(F.col("src").alias("node_id")).distinct().select(
        "node_id", F.col("node_id").alias("name")
    )

    def fake_llm(prompt: str) -> str:
        # round 1: propose the entity mention; later rounds: stop
        return "FINISH" if "Context:" in prompt else "c1"

    kg = ByoKGQueryEngine(triples, names, llm=fake_llm, max_iterations=1)
    answer, context = kg.query("what did customer c1 place?")
    print("kgqa context lines:", context.count(), "| answer chars:", len(answer))

    spark.stop()
    print("quickstart OK")


if __name__ == "__main__":
    main()
