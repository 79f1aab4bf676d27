"""Graph-traversal joins (SURVEY.md §2.3 J1-J11, J18).

Every Cypher MATCH pattern in the reference becomes a join pipeline over the
node/edge tables. The reference executes these per-seed in thread pools
(e.g. ``chunk_based_search.py:163-174``); here the seed *set* is a DataFrame
and each traversal is ONE lazily-planned DAG — the fan-out disappears.

Edge-table convention (FIXTURES.md §3): ``edges(src, dst, etype, value)``
with the per-type accessors on ``SparkGraphTables``. Seed frames are small
(≤ beam width × depth) — they are explicitly broadcast so every traversal
starts map-side; the big fact/statement tables never move for seeding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.fixtures import SparkGraphTables


def _seed(df: DataFrame, col: str) -> DataFrame:
    return F.broadcast(df.select(F.col(col)).distinct())


def chunk_to_statements(
    g: SparkGraphTables, seed_chunks: DataFrame, limit: int = 50
) -> DataFrame:
    """J1: ``(stmt)-[:BELONGS_TO]->(topic)-[:MENTIONED_IN]->(chunk)`` for seed
    chunks → distinct statement ids, deterministic LIMIT.
    Reference: ``retrieval/retrievers/chunk_based_search.py:88-99``."""
    belongs = g.edges_of("BELONGS_TO").select(
        F.col("src").alias("statement_id"), F.col("dst").alias("topic_id")
    )
    mentioned = g.edges_of("MENTIONED_IN_T").select(
        F.col("src").alias("topic_id"), F.col("dst").alias("chunk_id")
    )
    return (
        mentioned.join(_seed(seed_chunks, "chunk_id"), "chunk_id")
        .join(belongs, "topic_id")
        .select("statement_id")
        .distinct()
        .orderBy("statement_id")
        .limit(limit)
    )


def statements_to_context(g: SparkGraphTables, statement_ids: DataFrame) -> DataFrame:
    """J2: statement → (topic, chunk, source) context join.
    Reference: ``traversal_based_base_retriever.py:143-217`` (the MATCH half;
    the GROUP half is ``rollup.search_results``)."""
    stmts = g.statements.join(_seed(statement_ids, "statement_id"), "statement_id")
    chunks = g.chunks.select("chunk_id", "source_id", F.col("text").alias("chunk_text"))
    topics = g.topics.select("topic_id", F.col("value").alias("topic"))
    return (
        stmts.join(chunks, "chunk_id")
        .join(topics, "topic_id")
        .select(
            "statement_id", "value", "details", "stmt_index",
            "topic_id", "topic", "chunk_id", "chunk_text", "source_id",
        )
    )


def statement_facts(g: SparkGraphTables, statement_ids: DataFrame) -> DataFrame:
    """J3+A2: supporting fact values per statement (sorted set) + fact count
    as the statement score. Reference: ``traversal_based_base_retriever.py:193-216``."""
    supports = g.edges_of("SUPPORTS").select(
        F.col("src").alias("fact_id"), F.col("dst").alias("statement_id")
    )
    facts = g.facts.select("fact_id", F.col("value").alias("fact_value"))
    return (
        supports.join(_seed(statement_ids, "statement_id"), "statement_id")
        .join(facts, "fact_id")
        .groupBy("statement_id")
        .agg(
            F.sort_array(F.collect_set("fact_value")).alias("facts"),
            F.count(F.lit(1)).cast("double").alias("score"),
        )
    )


def entity_fact_walk(g: SparkGraphTables, seed_entities: DataFrame, limit: int = 50) -> DataFrame:
    """J4: single-entity fact walk —
    ``(e)-[:SUBJECT]->(f)-[:SUPPORTS]->(s)-[:PREVIOUS*0..1]-(l)``.
    The 0..1 *undirected* PREVIOUS hop = identity ∪ previous ∪ previous⁻¹.
    Reference: ``entity_based_search.py:191-196``."""
    subj = g.edges_of("SUBJECT").select(
        F.col("src").alias("entity_id"), F.col("dst").alias("fact_id")
    )
    supports = g.edges_of("SUPPORTS").select(
        F.col("src").alias("fact_id"), F.col("dst").alias("statement_id")
    )
    base = (
        subj.join(_seed(seed_entities, "entity_id"), "entity_id")
        .join(supports, "fact_id")
        .select("statement_id")
    )
    prev = g.edges_of("PREVIOUS").select(
        F.col("src").alias("statement_id"), F.col("dst").alias("other_id")
    )
    fwd = base.join(prev, "statement_id").select(F.col("other_id").alias("statement_id"))
    rev = base.join(
        prev.select(F.col("other_id").alias("statement_id"), F.col("statement_id").alias("other_id")),
        "statement_id",
    ).select(F.col("other_id").alias("statement_id"))
    return (
        base.unionByName(fwd).unionByName(rev)
        .distinct()
        .orderBy("statement_id")
        .limit(limit)
    )


def entity_pair_paths(
    g: SparkGraphTables, pairs: DataFrame, limit: int = 50
) -> DataFrame:
    """J5: facts whose subject AND object both lie on a 1..2-hop undirected
    RELATION path between an entity pair. ``pairs(e1, e2)``.
    Undirected closure = R ∪ Rᵀ; 2-hop via self-join excluding the trivial
    e1-r-e2-r-e1 cycle. Reference: ``entity_based_search.py:150-158``."""
    rel = g.edges_of("RELATION").select("src", "dst")
    und = rel.unionByName(rel.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    # hop1 + both hop2 legs read the undirected closure: materialize it
    # once instead of re-running the union+distinct per reference (§3.3)
    und = und.localCheckpoint(eager=False)
    p = F.broadcast(pairs.select("e1", "e2").distinct())

    hop1 = p.join(und, (und.src == p.e1) & (und.dst == p.e2)).select(
        "e1", "e2", F.array("e1", "e2").alias("path_nodes")
    )
    u1 = und.alias("u1")
    u2 = und.alias("u2")
    hop2 = (
        p.join(u1, F.col("u1.src") == p.e1)
        .join(
            u2,
            (F.col("u2.src") == F.col("u1.dst")) & (F.col("u2.dst") == p.e2),
        )
        .filter((F.col("u1.dst") != p.e1) & (F.col("u1.dst") != p.e2))
        .select("e1", "e2", F.array("e1", F.col("u1.dst"), "e2").alias("path_nodes"))
    )
    paths = hop1.unionByName(hop2)
    nodes = (
        paths.select("e1", "e2", F.explode("path_nodes").alias("entity_id"))
        .distinct()
        .localCheckpoint(eager=False)  # subject + object legs (pair-bounded)
    )

    facts = g.facts.filter(F.col("object_id").isNotNull()).select(
        "fact_id", "subject_id", "object_id", F.col("value").alias("fact_value")
    )
    on_subj = nodes.select("e1", "e2", F.col("entity_id").alias("subject_id"))
    on_obj = nodes.select("e1", "e2", F.col("entity_id").alias("object_id"))
    return (
        facts.join(on_subj, "subject_id")
        .join(on_obj, ["e1", "e2", "object_id"])
        .select("e1", "e2", "fact_id", "fact_value")
        .distinct()
        .orderBy("e1", "e2", "fact_id")
        .limit(limit)
    )


def topic_cooccurrence(g: SparkGraphTables, seed_topics: DataFrame) -> DataFrame:
    """J6: topics sharing a chunk with a seed topic.
    Reference: ``topic_beam_search.py:202-209``."""
    tm = g.edges_of("MENTIONED_IN_T").select(
        F.col("src").alias("topic_id"), F.col("dst").alias("chunk_id")
    )
    a = tm.join(_seed(seed_topics, "topic_id"), "topic_id")
    b = tm.select(F.col("topic_id").alias("other_topic_id"), "chunk_id")
    return (
        a.join(b, "chunk_id")
        .filter(F.col("topic_id") != F.col("other_topic_id"))
        .select("topic_id", "other_topic_id")
        .distinct()
    )


def topic_adjacency(g: SparkGraphTables, seed_topics: DataFrame) -> DataFrame:
    """J7: topics mentioned in the NEXT chunk after a seed topic's chunk.
    Reference: ``topic_beam_search.py:211-218``."""
    tm = g.edges_of("MENTIONED_IN_T").select(
        F.col("src").alias("topic_id"), F.col("dst").alias("chunk_id")
    )
    nxt = g.edges_of("NEXT").select(
        F.col("src").alias("chunk_id"), F.col("dst").alias("next_chunk_id")
    )
    a = tm.join(_seed(seed_topics, "topic_id"), "topic_id")
    b = tm.select(F.col("topic_id").alias("other_topic_id"), F.col("chunk_id").alias("next_chunk_id"))
    return (
        a.join(nxt, "chunk_id")
        .join(b, "next_chunk_id")
        .filter(F.col("topic_id") != F.col("other_topic_id"))
        .select("topic_id", "other_topic_id")
        .distinct()
    )


def topic_entity_overlap(
    g: SparkGraphTables, seed_topics: DataFrame, top_n: int = 10
) -> DataFrame:
    """J8: neighbor topics by shared-entity strength — topic→stmt→fact→entity
    then back out entity→fact→stmt→topic, scored by fact count, top-N per
    seed. Reference: ``topic_beam_search.py:188-198``."""
    belongs = g.edges_of("BELONGS_TO").select(
        F.col("src").alias("statement_id"), F.col("dst").alias("topic_id")
    )
    supports = g.edges_of("SUPPORTS").select(
        F.col("src").alias("fact_id"), F.col("dst").alias("statement_id")
    )
    subj = g.edges_of("SUBJECT").select(
        F.col("src").alias("entity_id"), F.col("dst").alias("fact_id")
    )
    # seed topic → its entities
    seed_ent = (
        belongs.join(_seed(seed_topics, "topic_id"), "topic_id")
        .join(supports, "statement_id")
        .join(subj, "fact_id")
        .select("topic_id", "entity_id")
        .distinct()
    )
    # entity → other topics, counting distinct supporting facts as strength
    back = (
        subj.join(seed_ent.select("topic_id", "entity_id"), "entity_id")
        .join(supports, "fact_id")
        .join(belongs.select("statement_id", F.col("topic_id").alias("other_topic_id")), "statement_id")
        .filter(F.col("topic_id") != F.col("other_topic_id"))
        .groupBy("topic_id", "other_topic_id")
        .agg(F.countDistinct("fact_id").alias("strength"))
    )
    w = Window.partitionBy("topic_id").orderBy(F.desc("strength"), F.asc("other_topic_id"))
    return (
        back.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_n)
        .drop("rn")
    )


def topic_sources(g: SparkGraphTables, seed_topics: DataFrame) -> DataFrame:
    """J18: topic → source via mentioned-chunk, one row per topic (the
    reference memoizes this per topic in an LRU; a distinct join *is* the
    cache). Reference: ``retrieval/utils/vector_utils.py:86-97``."""
    tm = g.edges_of("MENTIONED_IN_T").select(
        F.col("src").alias("topic_id"), F.col("dst").alias("chunk_id")
    )
    ex = g.edges_of("EXTRACTED_FROM").select(
        F.col("src").alias("chunk_id"), F.col("dst").alias("source_id")
    )
    return (
        tm.join(_seed(seed_topics, "topic_id"), "topic_id")
        .join(ex, "chunk_id")
        .select("topic_id", "source_id")
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("topic_id").orderBy("source_id")),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
