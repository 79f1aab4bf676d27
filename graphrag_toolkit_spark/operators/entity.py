"""Entity lookup and context-frontier expansion (SURVEY §2.3 J9-J10, §2.4 A3).

Parity targets:
- J9 keyword → entity lookup with exact-then-prefix fallback:
  ``retrieval/query_context/entity_provider.py:24-110``.
- J10 bounded frontier expansion scored by relation count, visited-set
  exclusion, per-node top-N: ``retrieval/query_context/entity_context_provider.py:26-107``.

J10 is a bounded iterative op (depth ≤ 3, frontier ≤ beam width): the loop
runs on the driver but each level is one DataFrame job; per-level
``localCheckpoint`` truncates lineage so the plan doesn't grow with depth
(SURVEY §4 "custom work" item 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.fixtures import SparkGraphTables
from graphrag_toolkit_spark.functions.text import search_string

LOCAL_ENTITY = "__Local_Entity__"


def lookup_entities(
    g: SparkGraphTables,
    keywords: DataFrame,
    include_local: bool = False,
    allow_prefix_fallback: bool = True,
) -> DataFrame:
    """J9: resolve keywords to entities.

    ``keywords(keyword [, classification])``. Exact match on the normalized
    ``search_str`` first; keywords with no exact hit fall back to a prefix
    (STARTS WITH) match. Local entities excluded unless ``include_local``
    (reference ``config.py:49`` DEFAULT_INCLUDE_LOCAL_ENTITIES=False).
    Returns (keyword, entity_id, value, classification, match_type).
    """
    ents = g.entities
    if not include_local:
        ents = ents.filter(F.col("classification") != LOCAL_ENTITY)
    kw = F.broadcast(
        keywords.select(search_string(F.col("keyword")).alias("kw")).distinct()
    )
    exact = ents.join(kw, ents.search_str == F.col("kw")).select(
        F.col("kw").alias("keyword"), "entity_id", "value", "classification",
        F.lit("exact").alias("match_type"),
    )
    if not allow_prefix_fallback:
        return exact
    missed = kw.join(
        exact.select(F.col("keyword").alias("kw")).distinct(), "kw", "left_anti"
    )
    prefix = ents.join(
        F.broadcast(missed), ents.search_str.startswith(F.col("kw"))
    ).select(
        F.col("kw").alias("keyword"), "entity_id", "value", "classification",
        F.lit("prefix").alias("match_type"),
    )
    return exact.unionByName(prefix)


def expand_entity_context(
    g: SparkGraphTables,
    seed_entities: DataFrame,
    max_depth: int = 3,
    per_node_limit: int = 5,
) -> DataFrame:
    """J10 over a lexical graph's RELATION edges (see ``expand_context``)."""
    return expand_context(
        g.edges_of("RELATION").select("src", "dst"),
        seed_entities, max_depth=max_depth, per_node_limit=per_node_limit,
    )


def expand_context(
    rel_edges: DataFrame,
    seed_entities: DataFrame,
    max_depth: int = 3,
    per_node_limit: int = 5,
) -> DataFrame:
    """J10: iterative frontier expansion over (src, dst) relation edges.

    Per level: frontier ⋈ edges (undirected, multiplicity-counted), neighbors
    scored by relation multiplicity (``count(r)``), per-source-node
    top-``per_node_limit``, minus already-visited nodes; a node reached via
    several parents keeps its strongest edge. Returns the accumulated context
    tree as (entity_id, parent_id, depth, strength); seeds have depth 0,
    null parent.

    Scale shape: the full undirected adjacency (groupBy over 2× the edge
    table — the dominant shuffle at corpus scale) is NEVER materialized.
    The frontier is tiny by construction (seeds × per_node_limit^depth), so
    each level broadcast-joins it against the raw edge list and aggregates
    multiplicities over only the frontier-incident edges — per-level work is
    an in-memory scan of the persisted edge list plus a near-empty shuffle.
    """
    rel = rel_edges.select("src", "dst")
    # loop-invariant input (often itself a computed join): materialize once
    rel.persist()

    id_type = dict(rel_edges.dtypes)["src"]
    visited = (
        seed_entities.select(F.col("entity_id")).distinct()
        .localCheckpoint(eager=True)
    )
    frontier = visited
    acc = visited.select(
        "entity_id",
        F.lit(None).cast(id_type).alias("parent_id"),
        F.lit(0).alias("depth"),
        F.lit(0).cast("long").alias("strength"),
    )
    for depth in range(1, max_depth + 1):
        # frontier-incident edges, both orientations, parallel edges kept
        # (multiplicity = strength)
        touching = (
            rel.join(
                F.broadcast(frontier.withColumnRenamed("entity_id", "src")), "src"
            )
            .select("src", "dst")
            .unionByName(
                rel.join(
                    F.broadcast(frontier.withColumnRenamed("entity_id", "dst")),
                    "dst",
                ).select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            )
        )
        cand = (
            touching.join(
                F.broadcast(visited.withColumnRenamed("entity_id", "dst")),
                "dst",
                "left_anti",
            )
            .groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("strength"))
        )
        w = Window.partitionBy("src").orderBy(F.desc("strength"), F.asc("dst"))
        nxt = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= per_node_limit)
            .select(
                F.col("dst").alias("entity_id"),
                F.col("src").alias("parent_id"),
                F.lit(depth).alias("depth"),
                F.col("strength"),
            )
            # a node reachable from two frontier parents: keep strongest edge
            .withColumn(
                "_rn2",
                F.row_number().over(
                    Window.partitionBy("entity_id").orderBy(
                        F.desc("strength"), F.asc("parent_id")
                    )
                ),
            )
            .filter(F.col("_rn2") == 1)
            .drop("_rn2")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        acc = acc.unionByName(nxt)
        frontier = nxt.select("entity_id")
        # nxt is checkpointed, per-entity deduped (_rn2), and disjoint from
        # visited (anti-join above) — the union is already distinct and its
        # pieces are checkpointed, so no re-checkpoint/dedup per level
        visited = visited.unionByName(frontier)
    rel.unpersist()
    return acc
