"""Lexical-graph traversal operators run over a TPC-H projection
(SURVEY §2.3 J1, J3-J8, J12, J18; §2.5 V4), each hash-checked against a
DuckDB oracle.

The fixture-graph unit tests exercise these operators structurally; here the
SAME operator code paths run over a graph projected from the driver's
relational fixtures, so the traversal semantics get end-to-end value-level
verification too:

    source  = customer  ('c'<custkey>)
    chunk   = order     ('o'<orderkey>)     EXTRACTED_FROM -> customer
    topic   = part      ('p'<partkey>)      MENTIONED_IN_T -> orders containing it
    stmt    = distinct (order, part)          ('l'<okey>-<pkey>)
    fact    = distinct (order[, part], supp)  ('f'<okey>[-<pkey>]-<skey>)
    pairfact= distinct (supp, part)           ('g'<skey>-<pkey>)  "s supplies p"
    entity  = supplier  ('s'<suppkey>) / part ('p'<partkey>)

Ids are minted on DISTINCT projections only: the fixture's
(l_orderkey, l_linenumber) is not a unique key, so row-position ids would
alias distinct rows.

Reference parity cited per-operator in ``operators/traversal.py`` /
``operators/bfs.py`` — these workload wrappers only build the projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.fixtures import SparkGraphTables
from graphrag_toolkit_spark.operators import bfs, traversal, vss
from graphrag_toolkit_spark.session import load
from graphrag_toolkit_spark.workload.graphish import EDGES_SQL, _triples


def _tag(prefix: str, col) -> F.Column:
    return F.concat(F.lit(prefix), F.col(col).cast("string"))


def _edges(*parts: DataFrame) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # traversal operators filter the edge table per etype, usually 2-3
    # references per query: truncate so the union of distinct-pair builds
    # is planned and computed once, not per edges_of() call (§3.3)
    return out.withColumn(
        "value", F.lit(None).cast("string")
    ).localCheckpoint(eager=False)


def _e(df: DataFrame, src: F.Column, dst: F.Column, etype: str) -> DataFrame:
    return df.select(src.alias("src"), dst.alias("dst"), F.lit(etype).alias("etype"))


def _graph(spark: SparkSession, edges: DataFrame, **tables: DataFrame) -> SparkGraphTables:
    empty = spark.createDataFrame([], "x string")
    fields = dict(
        sources=empty, chunks=empty, topics=empty, statements=empty,
        facts=empty, entities=empty, edges=edges,
        embeddings_chunk=empty, embeddings_statement=empty, embeddings_topic=empty,
    )
    fields.update(tables)
    return SparkGraphTables(**fields)


# shared DuckDB id fragments (NOTE: (l_orderkey, l_linenumber) is NOT unique
# in the fixture — ids are only minted on DISTINCT projections)
_O = "'o' || CAST(l_orderkey AS VARCHAR)"
_P = "'p' || CAST(l_partkey AS VARCHAR)"
_S = "'s' || CAST(l_suppkey AS VARCHAR)"


# --- J1: chunk -> statements (stmt BELONGS_TO topic MENTIONED_IN chunk) -------

def chunk_statements_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    # statement grain = distinct (order, part): the fixture's
    # (l_orderkey, l_linenumber) is NOT unique, so line-position ids would
    # alias distinct rows — every id here is minted on a DISTINCT projection
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    op = li.select("l_orderkey", "l_partkey").distinct()
    stmt_id = F.concat(
        F.lit("l"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_partkey").cast("string"),
    )
    belongs = _e(op, stmt_id, _tag("p", "l_partkey"), "BELONGS_TO")
    mentioned = _e(op, _tag("p", "l_partkey"), _tag("o", "l_orderkey"), "MENTIONED_IN_T")
    g = _graph(spark, _edges(belongs, mentioned))
    seeds = orders.filter(F.col("o_orderkey") <= 32).select(
        _tag("o", "o_orderkey").alias("chunk_id")
    )
    return traversal.chunk_to_statements(g, seeds, limit=50)


CHUNK_STATEMENTS_ORACLE = f"""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
st AS (SELECT 'l' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR) AS statement_id,
              {_P} AS topic_id FROM op),
tm AS (SELECT {_P} AS topic_id, {_O} AS chunk_id FROM op),
seeds AS (SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS chunk_id FROM orders WHERE o_orderkey <= 32)
SELECT statement_id FROM (
  SELECT DISTINCT s.statement_id
  FROM st s JOIN tm ON s.topic_id = tm.topic_id JOIN seeds k ON tm.chunk_id = k.chunk_id
) ORDER BY statement_id LIMIT 50
"""


# --- J3/A2: statement -> supporting facts (sorted set + count score) ----------

def statement_facts_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    pair_fact = F.concat(
        F.lit("g"), F.col("l_suppkey").cast("string"),
        F.lit("-"), F.col("l_partkey").cast("string"),
    )
    supports = _e(
        li.select("l_suppkey", "l_partkey", "l_orderkey").distinct(),
        pair_fact, _tag("o", "l_orderkey"), "SUPPORTS",
    )
    facts = li.select(
        pair_fact.alias("fact_id"),
        F.concat(_tag("s", "l_suppkey"), F.lit(" supplies "), _tag("p", "l_partkey"))
        .alias("value"),
    ).distinct()
    g = _graph(spark, _edges(supports), facts=facts)
    seeds = orders.filter(F.col("o_orderkey") <= 200).select(
        _tag("o", "o_orderkey").alias("statement_id")
    )
    out = traversal.statement_facts(g, seeds)
    return out.select(
        "statement_id", F.concat_ws(", ", "facts").alias("facts_str"), "score"
    )


STATEMENT_FACTS_ORACLE = f"""
WITH sp AS (
  SELECT DISTINCT {_O} AS statement_id,
         {_S} || ' supplies ' || {_P} AS fact_value
  FROM lineitem WHERE l_orderkey <= 200
)
SELECT statement_id,
       array_to_string(list_sort(list(DISTINCT fact_value)), ', ') AS facts_str,
       CAST(COUNT(DISTINCT fact_value) AS DOUBLE) AS score
FROM sp GROUP BY statement_id
"""


# --- J4: single-entity fact walk with 0..1 undirected PREVIOUS hop ------------

def entity_fact_walk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    # fact grain = distinct (order, supplier) — see chunk_statements_orders
    os = li.select("l_orderkey", "l_suppkey").distinct()
    fact_id = F.concat(
        F.lit("f"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_suppkey").cast("string"),
    )
    subj = _e(os, _tag("s", "l_suppkey"), fact_id, "SUBJECT")
    supports = _e(os, fact_id, _tag("o", "l_orderkey"), "SUPPORTS")
    # PREVIOUS: each customer's order chain by orderkey
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = orders.withColumn("prev_key", F.lag("o_orderkey").over(w)).filter(
        F.col("prev_key").isNotNull()
    )
    prev = _e(chain, _tag("o", "o_orderkey"), _tag("o", "prev_key"), "PREVIOUS")
    g = _graph(spark, _edges(subj, supports, prev))
    seeds = spark.createDataFrame([{"entity_id": f"s{i}"} for i in (1, 2, 3)])
    return traversal.entity_fact_walk(g, seeds, limit=50)


ENTITY_FACT_WALK_ORACLE = f"""
WITH base AS (
  SELECT DISTINCT {_O} AS sid FROM lineitem WHERE l_suppkey BETWEEN 1 AND 3
),
chain AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS sid,
         LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_key
  FROM orders
),
prev AS (SELECT sid, 'o' || CAST(prev_key AS VARCHAR) AS prev_sid FROM chain WHERE prev_key IS NOT NULL),
fwd AS (SELECT p.prev_sid AS sid FROM prev p JOIN base b ON p.sid = b.sid),
rev AS (SELECT p.sid FROM prev p JOIN base b ON p.prev_sid = b.sid)
SELECT statement_id FROM (
  SELECT DISTINCT sid AS statement_id FROM (
    SELECT sid FROM base UNION ALL SELECT sid FROM fwd UNION ALL SELECT sid FROM rev
  )
) ORDER BY statement_id LIMIT 50
"""


# --- J5 (+T10/T12): entity-pair 1..2-hop undirected paths -> facts ------------

_PAIRS = [("p1", "p2"), ("p1", "p3"), ("p2", "p3"), ("s1", "p1")]


def entity_pair_paths_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sp = li.select("l_suppkey", "l_partkey").distinct()
    rel = _e(sp, _tag("s", "l_suppkey"), _tag("p", "l_partkey"), "RELATION")
    facts = sp.select(
        F.concat(
            F.lit("g"), F.col("l_suppkey").cast("string"),
            F.lit("-"), F.col("l_partkey").cast("string"),
        ).alias("fact_id"),
        _tag("s", "l_suppkey").alias("subject_id"),
        _tag("p", "l_partkey").alias("object_id"),
        F.concat(_tag("s", "l_suppkey"), F.lit(" supplies "), _tag("p", "l_partkey"))
        .alias("value"),
    )
    g = _graph(spark, _edges(rel), facts=facts)
    pairs = spark.createDataFrame([{"e1": a, "e2": b} for a, b in _PAIRS])
    return traversal.entity_pair_paths(g, pairs, limit=100)


_PAIR_VALUES = ", ".join(f"('{a}', '{b}')" for a, b in _PAIRS)

ENTITY_PAIR_PATHS_ORACLE = f"""
WITH sp AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
rel AS (SELECT {_S} AS src, {_P} AS dst FROM sp),
und AS (SELECT src, dst FROM rel UNION SELECT dst, src FROM rel),
prs(e1, e2) AS (VALUES {_PAIR_VALUES}),
hop1 AS (
  SELECT p.e1, p.e2, [p.e1, p.e2] AS path_nodes
  FROM prs p JOIN und u ON u.src = p.e1 AND u.dst = p.e2
),
hop2 AS (
  SELECT p.e1, p.e2, [p.e1, u1.dst, p.e2] AS path_nodes
  FROM prs p
  JOIN und u1 ON u1.src = p.e1
  JOIN und u2 ON u2.src = u1.dst AND u2.dst = p.e2
  WHERE u1.dst != p.e1 AND u1.dst != p.e2
),
nodes AS (
  SELECT DISTINCT e1, e2, unnest(path_nodes) AS ent
  FROM (SELECT * FROM hop1 UNION ALL SELECT * FROM hop2)
),
facts AS (
  SELECT 'g' || CAST(l_suppkey AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR) AS fact_id,
         {_S} AS subject_id, {_P} AS object_id,
         {_S} || ' supplies ' || {_P} AS fact_value
  FROM sp
)
SELECT e1, e2, fact_id, fact_value FROM (
  SELECT DISTINCT a.e1, a.e2, f.fact_id, f.fact_value
  FROM facts f
  JOIN nodes a ON f.subject_id = a.ent
  JOIN nodes b ON b.e1 = a.e1 AND b.e2 = a.e2 AND f.object_id = b.ent
) ORDER BY e1, e2, fact_id LIMIT 100
"""


# --- J7: topic adjacency via NEXT-chunk ---------------------------------------

def topic_adjacency_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    mentioned = _e(
        li.select("l_partkey", "l_orderkey").distinct(),
        _tag("p", "l_partkey"), _tag("o", "l_orderkey"), "MENTIONED_IN_T",
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    chain = orders.withColumn("next_key", F.lead("o_orderkey").over(w)).filter(
        F.col("next_key").isNotNull()
    )
    nxt = _e(chain, _tag("o", "o_orderkey"), _tag("o", "next_key"), "NEXT")
    g = _graph(spark, _edges(mentioned, nxt))
    seeds = spark.createDataFrame([{"topic_id": f"p{i}"} for i in range(1, 21)])
    return traversal.topic_adjacency(g, seeds)


TOPIC_ADJACENCY_ORACLE = f"""
WITH tm AS (SELECT DISTINCT {_P} AS topic_id, {_O} AS chunk_id FROM lineitem),
chain AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS chunk_id,
         'o' || CAST(LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS VARCHAR)
           AS next_chunk_id
  FROM orders
),
seeds AS (SELECT 'p' || CAST(i AS VARCHAR) AS topic_id FROM generate_series(1, 20) AS t(i))
SELECT DISTINCT a.topic_id, b.topic_id AS other_topic_id
FROM tm a
JOIN seeds s ON a.topic_id = s.topic_id
JOIN chain c ON c.chunk_id = a.chunk_id AND c.next_chunk_id IS NOT NULL
JOIN tm b ON b.chunk_id = c.next_chunk_id
WHERE a.topic_id != b.topic_id
"""


# --- J8: topic neighbors by shared-entity strength, top-N per seed ------------

def topic_overlap_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # statement grain = distinct (order, part); fact grain = distinct
    # (order, part, supplier) — see chunk_statements_orders
    tri = li.select("l_orderkey", "l_partkey", "l_suppkey").distinct()
    stmt_id = F.concat(
        F.lit("l"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_partkey").cast("string"),
    )
    fact_id = F.concat(
        F.lit("f"), F.col("l_orderkey").cast("string"),
        F.lit("-"), F.col("l_partkey").cast("string"),
        F.lit("-"), F.col("l_suppkey").cast("string"),
    )
    belongs = _e(
        tri.select("l_orderkey", "l_partkey").distinct(),
        stmt_id, _tag("p", "l_partkey"), "BELONGS_TO",
    )
    supports = _e(tri, fact_id, stmt_id, "SUPPORTS")
    subj = _e(tri, _tag("s", "l_suppkey"), fact_id, "SUBJECT")
    g = _graph(spark, _edges(belongs, supports, subj))
    seeds = spark.createDataFrame([{"topic_id": f"p{i}"} for i in range(1, 11)])
    return traversal.topic_entity_overlap(g, seeds, top_n=5)


TOPIC_OVERLAP_ORACLE = f"""
WITH tri AS (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem),
li AS (
  SELECT {_P} AS topic_id, {_S} AS entity_id,
         'f' || CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_partkey AS VARCHAR)
             || '-' || CAST(l_suppkey AS VARCHAR) AS fact_id,
         l_partkey
  FROM tri
),
seed_ent AS (
  SELECT DISTINCT topic_id, entity_id FROM li WHERE l_partkey BETWEEN 1 AND 10
),
back AS (
  SELECT s.topic_id, l.topic_id AS other_topic_id, COUNT(DISTINCT l.fact_id) AS strength
  FROM seed_ent s JOIN li l ON l.entity_id = s.entity_id
  WHERE s.topic_id != l.topic_id
  GROUP BY s.topic_id, other_topic_id
)
SELECT topic_id, other_topic_id, strength FROM (
  SELECT topic_id, other_topic_id, strength,
         ROW_NUMBER() OVER (PARTITION BY topic_id
                            ORDER BY strength DESC, other_topic_id) AS rn
  FROM back
) WHERE rn <= 5
"""


# --- J18: topic -> source resolution (first source per topic) -----------------

def topic_sources_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    mentioned = _e(
        li.select("l_partkey", "l_orderkey").distinct(),
        _tag("p", "l_partkey"), _tag("o", "l_orderkey"), "MENTIONED_IN_T",
    )
    extracted = _e(orders, _tag("o", "o_orderkey"), _tag("c", "o_custkey"), "EXTRACTED_FROM")
    g = _graph(spark, _edges(mentioned, extracted))
    seeds = spark.createDataFrame([{"topic_id": f"p{i}"} for i in range(1, 51)])
    return traversal.topic_sources(g, seeds)


TOPIC_SOURCES_ORACLE = f"""
WITH tm AS (SELECT DISTINCT {_P} AS topic_id, {_O} AS chunk_id FROM lineitem),
ex AS (
  SELECT 'o' || CAST(o_orderkey AS VARCHAR) AS chunk_id,
         'c' || CAST(o_custkey AS VARCHAR) AS source_id
  FROM orders
),
seeds AS (SELECT 'p' || CAST(i AS VARCHAR) AS topic_id FROM generate_series(1, 50) AS t(i))
SELECT topic_id, source_id FROM (
  SELECT t.topic_id, e.source_id,
         ROW_NUMBER() OVER (PARTITION BY t.topic_id ORDER BY e.source_id) AS rn
  FROM tm t JOIN seeds s ON t.topic_id = s.topic_id JOIN ex e ON e.chunk_id = t.chunk_id
) WHERE rn = 1
"""


# --- J12/J13: one-hop + multi-hop triplet expansion ---------------------------

def multi_hop_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = spark.createDataFrame([{"node_id": "c1"}, {"node_id": "c2"}])
    # final .distinct() makes multi-hop duplicate-edge-insensitive
    return bfs.multi_hop(_triples(spark, sf_dir, dedup=False), seeds, hops=2)


MULTI_HOP_ORACLE = f"""
WITH e AS ({EDGES_SQL}),
h1 AS (
  SELECT e.src, e.rel, e.dst FROM e WHERE e.src IN ('c1', 'c2')
),
h2 AS (
  SELECT e.src, e.rel, e.dst FROM e JOIN (SELECT DISTINCT dst FROM h1) f ON e.src = f.dst
)
SELECT DISTINCT src, rel, dst FROM (SELECT * FROM h1 UNION ALL SELECT * FROM h2)
"""


def graph_schema_relations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bfs.schema_relations(_triples(spark, sf_dir, dedup=False))


SCHEMA_RELATIONS_ORACLE = f"""
WITH e AS ({EDGES_SQL})
SELECT DISTINCT rel FROM e
"""


# --- V4: batched embedding fetch by id ----------------------------------------

def fetch_embeddings_by_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    ids = spark.createDataFrame([{"vec_id": i} for i in range(0, 100, 7)])
    got = vss.fetch_embeddings(emb, ids, id_col="vec_id")
    # project the array to scalars the cross-engine hash can compare
    return got.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1), 6).alias("e0"),
    )


FETCH_EMBEDDINGS_ORACLE = """
SELECT vec_id, label, len(embedding) AS dim, ROUND(embedding[1], 6) AS e0
FROM embeddings
WHERE vec_id IN (SELECT 7 * i FROM generate_series(0, 14) AS t(i))
"""


def nlp_keywords_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 nlp keyword provider over synthesized mixed-case query strings
    ('What did Customer#… buy in ALGERIA AFRICA …'): capitalized-run
    extraction, stopword filter ('What' drops), multi-token runs (nation +
    region uppercase pair), case-insensitive first-occurrence dedup (the
    repeated customer name collapses). Pure JVM column expression — the same
    ``nlp_keywords_col`` the retrieval seed path uses."""
    from graphrag_toolkit_spark.keywords import nlp_keywords

    cust = load(spark, sf_dir, "customer")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    src = (
        cust.join(nat, cust.c_nationkey == nat.n_nationkey)
        .join(reg, nat.n_regionkey == reg.r_regionkey)
        .select(
            F.col("c_custkey").alias("qid"),
            F.concat(
                F.lit("What did "), F.col("c_name"), F.lit(" buy in "),
                F.col("n_name"), F.lit(" "), F.col("r_name"),
                F.lit(" this year from "), F.col("c_name"),
            ).alias("qtext"),
        )
    )
    return nlp_keywords(src, "qtext", "qid").withColumnRenamed("id", "qid")


def _nlp_keywords_oracle() -> str:
    from graphrag_toolkit_spark.keywords import CAP_RUN_RE, KEYWORD_STOPWORDS

    stops = ", ".join(f"'{w}'" for w in KEYWORD_STOPWORDS)
    return f"""
WITH src AS (
  SELECT c_custkey AS qid,
         'What did ' || c_name || ' buy in ' || n_name || ' ' || r_name
           || ' this year from ' || c_name AS qtext
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
),
runs AS (SELECT qid, regexp_extract_all(qtext, '{CAP_RUN_RE}') AS a FROM src),
idx AS (SELECT qid, a, unnest(generate_series(1, len(a))) AS i FROM runs),
toks AS (SELECT qid, i, a[i] AS k FROM idx),
filt AS (
  SELECT qid, i, k FROM toks
  WHERE length(k) >= 2
    AND len(list_filter(string_split(lower(k), ' '),
                        t -> NOT list_contains([{stops}], t))) > 0
),
firsts AS (
  SELECT qid, i, k FROM (
    SELECT qid, i, k,
           ROW_NUMBER() OVER (PARTITION BY qid, lower(k) ORDER BY i) AS rn
    FROM filt
  ) WHERE rn = 1
)
SELECT qid,
       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY i) - 1 AS INTEGER) AS pos,
       k AS keyword
FROM firsts
"""


NLP_KEYWORDS_ORACLE = _nlp_keywords_oracle()


QUERIES = {
    "nlp_keywords_customers": nlp_keywords_customers,
    "chunk_statements_orders": chunk_statements_orders,
    "statement_facts_orders": statement_facts_orders,
    "entity_fact_walk_suppliers": entity_fact_walk_suppliers,
    "entity_pair_paths_parts": entity_pair_paths_parts,
    "topic_adjacency_parts": topic_adjacency_parts,
    "topic_overlap_suppliers": topic_overlap_suppliers,
    "topic_sources_parts": topic_sources_parts,
    "multi_hop_customers": multi_hop_customers,
    "graph_schema_relations": graph_schema_relations,
    "fetch_embeddings_by_id": fetch_embeddings_by_id,
}

ORACLES = {
    "nlp_keywords_customers": NLP_KEYWORDS_ORACLE,
    "chunk_statements_orders": CHUNK_STATEMENTS_ORACLE,
    "statement_facts_orders": STATEMENT_FACTS_ORACLE,
    "entity_fact_walk_suppliers": ENTITY_FACT_WALK_ORACLE,
    "entity_pair_paths_parts": ENTITY_PAIR_PATHS_ORACLE,
    "topic_adjacency_parts": TOPIC_ADJACENCY_ORACLE,
    "topic_overlap_suppliers": TOPIC_OVERLAP_ORACLE,
    "topic_sources_parts": TOPIC_SOURCES_ORACLE,
    "multi_hop_customers": MULTI_HOP_ORACLE,
    "graph_schema_relations": SCHEMA_RELATIONS_ORACLE,
    "fetch_embeddings_by_id": FETCH_EMBEDDINGS_ORACLE,
}
