"""Link prediction and deterministic random-walk sampling over edge tables.

Graph-ML training-data primitives the reference's graph store feeds into
downstream models (byokg-rag's KG completion loop consumes exactly these
shapes; cf. reference byokg-rag/graphrag_toolkit/byokg_rag/graphstore/
local_kg_stores.py — neighbor expansion and path sampling over triples):

- ``link_prediction``: score non-adjacent node pairs at distance 2 by
  common-neighbor count, Jaccard coefficient, and preferential attachment.
- ``random_walks``: a node2vec-style walk corpus with a *deterministic*
  engine-portable next-hop choice (md5 of (start, step, cur) mod degree), so
  the walk table is reproducible across runs, partitionings, and engines —
  the property a 100 TB embedding pipeline needs for resumable training.

Scale notes: every stage is an equi-join or a groupBy on node keys. The wedge
enumeration is Θ(Σ deg(x)²) — bounded by capping hub degrees upstream (the
workload's edge builders already threshold edges); no cartesian products, no
driver-side state. Walks are L chained equi-joins on the current node — each
round shuffles only the walk frontier (n_nodes rows), never the edge table,
and the adjacency table with its per-neighbor index is built once and reused
across all L rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _und(edges: DataFrame, a: str, b: str) -> DataFrame:
    """Undirected view of an a<b edge list: both orientations, columns u, v."""
    fwd = edges.select(F.col(a).alias("u"), F.col(b).alias("v"))
    rev = edges.select(F.col(b).alias("u"), F.col(a).alias("v"))
    return fwd.unionByName(rev)


def link_prediction(
    edges: DataFrame, a: str = "pa", b: str = "pb", min_common: int = 1
) -> DataFrame:
    """Score non-adjacent candidate pairs at distance 2.

    Input: an undirected edge list with ``a < b`` per row (simple graph).
    Output per candidate pair (u < v, not an edge, ≥ ``min_common`` common
    neighbors): ``common_neighbors`` (exact count), ``jaccard``
    (cn / (deg_u + deg_v − cn), one double division on exact bigints —
    bit-identical across engines), ``pref_attachment`` (deg_u × deg_v).

    Exactness: counts and degrees are exact integers; jaccard is a single
    IEEE division of exact operands, so it hashes identically in Spark and
    DuckDB. No log-based scores (Adamic-Adar) on purpose — ``ln`` is not
    bit-portable across engines.
    """
    # the edge list feeds SEVEN plan references (deg, both wedge sides via
    # und, the anti-join, and the two degree joins re-derive from it):
    # truncate once so the (possibly expensive) upstream build is computed
    # and planned a single time (guide §3.3 — materialize shared inputs of
    # wide multi-reference plans)
    edges = edges.localCheckpoint(eager=False)
    und = _und(edges, a, b)
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    w1 = und.select(F.col("u").alias("cu"), F.col("v").alias("x"))
    w2 = und.select(F.col("u").alias("x"), F.col("v").alias("cv"))
    cn = (
        w1.join(w2, "x")
        .filter(F.col("cu") < F.col("cv"))
        .groupBy("cu", "cv")
        .agg(F.count(F.lit(1)).alias("common_neighbors"))
        .filter(F.col("common_neighbors") >= min_common)
    )
    # Drop pairs that are already edges (candidates must be non-adjacent).
    cand = cn.join(
        edges.select(F.col(a).alias("cu"), F.col(b).alias("cv")),
        ["cu", "cv"],
        "left_anti",
    )
    du = deg.select(F.col("u").alias("cu"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("u").alias("cv"), F.col("deg").alias("deg_v"))
    return (
        cand.join(du, "cu")
        .join(dv, "cv")
        .select(
            F.col("cu").alias("node_u"),
            F.col("cv").alias("node_v"),
            "common_neighbors",
            (
                F.col("common_neighbors").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("common_neighbors"))
            ).alias("jaccard"),
            (F.col("deg_u") * F.col("deg_v")).alias("pref_attachment"),
        )
    )


def random_walks(
    edges: DataFrame,
    a: str = "pa",
    b: str = "pb",
    walk_length: int = 3,
    salt: str = "walk",
) -> DataFrame:
    """Deterministic random-walk corpus: one walk per node, ``walk_length``
    hops, next hop = neighbor at index ``md5(salt|start|step|cur) mod deg``.

    The adjacency table carries a dense per-node neighbor index
    (row_number over neighbor id — a total order, so the index is unique
    and engine-portable) and is computed once; each hop is one equi-join of
    the walk frontier against it. Walks that reach a node are never dangling
    (every node in the adjacency has ≥ 1 neighbor by construction).

    Output: (start, step, node) — step 0 is the start node itself.
    """
    und = _und(edges.localCheckpoint(eager=False), a, b)
    adj = und.select(
        "u",
        "v",
        (F.row_number().over(Window.partitionBy("u").orderBy("v")) - 1).alias(
            "idx"
        ),
        F.count(F.lit(1)).over(Window.partitionBy("u")).alias("deg"),
    )
    # every hop joins against adj, and each frontier's plan embeds its
    # predecessor's — without truncation the L-hop plan re-derives the
    # adjacency (sort + two windows) once per REFERENCE, which nests
    # quadratically in L (guide §3.3). Checkpoints bound it: adj is built
    # once, each frontier's lineage is one join deep.
    adj = adj.localCheckpoint(eager=False)
    nodes = und.select("u").distinct()
    frontier = nodes.select(
        F.col("u").alias("start"), F.lit(0).alias("step"), F.col("u").alias("node")
    )
    out = frontier
    for step in range(1, walk_length + 1):
        pick = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|",
                            F.lit(salt),
                            F.col("start").cast("string"),
                            F.lit(str(step)),
                            F.col("node").cast("string"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("bigint")
        )
        frontier = (
            frontier.join(adj, frontier.node == adj.u)
            .filter((pick % F.col("deg")) == F.col("idx"))
            .select(
                "start",
                F.lit(step).alias("step"),
                F.col("v").alias("node"),
            )
            .localCheckpoint(eager=False)  # see adj note: keeps the union flat
        )
        out = out.unionByName(frontier)
    return out
