"""Extract-and-build pipeline workload (SURVEY §3.1): the full ingestion DAG
— documents → chunks → rule-extraction → content-addressed node/edge tables —
run by the REAL ``indexing.extract_and_build`` and hash-checked against a
DuckDB oracle that re-derives every id and MERGE survivor in ANSI SQL.

This is the strongest end-to-end check in the suite: a single value mismatch
anywhere in id minting, window extraction, fact explosion, or dedup-survivor
choice shows up as a hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_toolkit_spark import indexing
from graphrag_toolkit_spark.session import load

_W = indexing.STATEMENT_WINDOW
_EMIN = indexing.ENTITY_MIN_LEN

# shared oracle CTEs: chunk rows with content ids → statement windows → facts
_BASE_SQL = rf"""
ch AS (
  SELECT source_id, source_id || ':' || substring(md5(text || meta),1,8) AS chunk_id,
         string_split(text, ' ') AS ws
  FROM (
    SELECT 'aws::' || substring(md5(text),1,8) || ':' || substring(md5(meta),1,4) AS source_id,
           text, meta
    FROM (SELECT text, lang || ';' || source AS meta FROM documents)
  )
),
st AS (
  SELECT source_id, chunk_id, topic_id, topic, statement_idx, value,
         md5('statement::' || topic_id || '::' || value) AS statement_id
  FROM (
    SELECT source_id, chunk_id,
           md5('topic::' || ws[1]) AS topic_id, ws[1] AS topic,
           unnest(list_transform(generate_series(0, CAST(ceil(len(ws)/{_W}.0) AS INT) - 1),
                  i -> struct_pack(statement_idx := i,
                                   value := array_to_string(ws[i*{_W}+1 : i*{_W}+{_W}], ' '))),
                  recursive := true)
    FROM ch
  )
),
fx AS (
  SELECT statement_id, subject, object,
         subject || ' near ' || object AS value,
         md5('fact::' || subject || '::' || object) AS fact_id,
         md5('entity::' || subject || '::Head') AS subject_entity_id,
         md5('entity::' || object || '::Term') AS object_entity_id
  FROM (
    SELECT statement_id, string_split(value,' ')[1] AS subject,
           unnest(list_distinct(list_filter(string_split(value,' '),
                  t -> len(t) >= {_EMIN} AND t <> string_split(value,' ')[1]))) AS object
    FROM (SELECT DISTINCT statement_id, value FROM st)
  )
)
"""


# --- statements node table ----------------------------------------------------

def extract_build_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    build = indexing.extract_and_build(docs)
    return build["statements"]


STATEMENTS_ORACLE = f"""
WITH {_BASE_SQL}
SELECT statement_id, chunk_id, topic_id, statement_idx, value FROM (
  SELECT statement_id, chunk_id, topic_id, statement_idx, value,
         ROW_NUMBER() OVER (PARTITION BY statement_id
                            ORDER BY chunk_id, statement_idx) AS rn
  FROM st
) WHERE rn = 1
"""


# --- fact graph with support counts ------------------------------------------

def extract_build_fact_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    chunks = indexing.docs_to_chunks(docs)
    stmts = indexing.rule_extract_statements(chunks)
    facts = indexing.extract_facts(stmts)
    return facts.groupBy(
        "fact_id", "subject", "object", "value",
        "subject_entity_id", "object_entity_id",
    ).agg(F.countDistinct("statement_id").alias("n_supports"))


FACT_GRAPH_ORACLE = f"""
WITH {_BASE_SQL}
SELECT fact_id, subject, object, value, subject_entity_id, object_entity_id,
       COUNT(DISTINCT statement_id) AS n_supports
FROM fx
GROUP BY fact_id, subject, object, value, subject_entity_id, object_entity_id
"""


# --- per-table build counts (everything incl. edges) -------------------------

def extract_build_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Counting every build table does not require MATERIALIZING every build
    # table: each table is a distinct-projection of one of the three
    # extraction stages, so its row count is a countDistinct over that
    # stage (guide §1.2: don't compute things you throw away; §2.4: fused
    # same-source aggregates share one pass). Three multi-countDistinct
    # aggregates + the PREVIOUS-chain branch replace the 15 independent
    # count branches (each of which paid its own scan, dedup exchange, and
    # single-partition count). Equivalence with per-table counts over
    # indexing.extract_and_build is pinned by test_pipeline_counts and the
    # DuckDB oracle at three SFs.
    docs = load(spark, sf_dir, "documents")
    chunks = indexing.docs_to_chunks(docs).localCheckpoint(eager=False)
    stmts = indexing.rule_extract_statements(chunks).localCheckpoint(eager=False)
    facts = indexing.extract_facts(stmts)

    ch_agg = chunks.agg(
        F.countDistinct("source_id").alias("sources"),
        F.countDistinct("chunk_id").alias("chunks"),
        F.countDistinct("chunk_id", "source_id").alias("e_extracted_from"),
    )
    st_agg = stmts.agg(
        F.countDistinct("topic_id").alias("topics"),
        F.countDistinct("statement_id").alias("statements"),
        F.countDistinct("topic_id", "chunk_id").alias("e_mentioned_t"),
        F.countDistinct("statement_id", "chunk_id").alias("e_mentioned_s"),
        F.countDistinct("statement_id", "topic_id").alias("e_belongs_to"),
    )
    fx_agg = facts.agg(
        F.countDistinct("fact_id").alias("facts"),
        (
            F.countDistinct("subject_entity_id")
            + F.countDistinct("object_entity_id")
        ).alias("entities"),
        F.countDistinct("fact_id", "statement_id").alias("e_supports"),
        F.countDistinct("subject_entity_id", "fact_id").alias("e_subject"),
        F.countDistinct("object_entity_id", "fact_id").alias("e_object"),
    )
    # the per-chunk statement linked list (same construction as
    # extract_and_build's `prev`, counted instead of materialized)
    w = indexing.Window.partitionBy("chunk_id").orderBy("statement_idx")
    prev_agg = (
        stmts.select("chunk_id", "statement_idx", "statement_id").distinct()
        .withColumn("_prev", F.lag("statement_id").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("statement_id")))
        .select("statement_id", "_prev").distinct()
        .agg(F.count(F.lit(1)).alias("e_previous"))
    )

    one = ch_agg.crossJoin(st_agg).crossJoin(fx_agg).crossJoin(prev_agg)
    pair = lambda name, col: F.struct(
        F.lit(name).alias("table_name"), col.cast("long").alias("n_rows")
    )
    return one.select(
        F.explode(
            F.array(
                pair("sources", F.col("sources")),
                pair("chunks", F.col("chunks")),
                pair("topics", F.col("topics")),
                pair("statements", F.col("statements")),
                pair("facts", F.col("facts")),
                pair("entities", F.col("entities")),
                pair(
                    "edges",
                    F.col("e_extracted_from") + F.col("e_mentioned_t")
                    + F.col("e_mentioned_s") + F.col("e_belongs_to")
                    + F.col("e_supports") + F.col("e_subject")
                    + F.col("e_object") + F.col("e_previous"),
                ),
            )
        ).alias("_kv")
    ).select("_kv.table_name", "_kv.n_rows")


COUNTS_ORACLE = f"""
WITH {_BASE_SQL},
prev AS (
  SELECT DISTINCT statement_id AS src, prev_id AS dst FROM (
    SELECT statement_id,
           LAG(statement_id) OVER (PARTITION BY chunk_id ORDER BY statement_idx) AS prev_id
    FROM (SELECT DISTINCT chunk_id, statement_idx, statement_id FROM st)
  ) WHERE prev_id IS NOT NULL AND prev_id <> statement_id
),
edge_counts AS (
  SELECT
    (SELECT COUNT(*) FROM (SELECT DISTINCT chunk_id, source_id FROM ch))
    + (SELECT COUNT(*) FROM (SELECT DISTINCT topic_id, chunk_id FROM st))
    + (SELECT COUNT(*) FROM (SELECT DISTINCT statement_id, chunk_id FROM st))
    + (SELECT COUNT(*) FROM (SELECT DISTINCT statement_id, topic_id FROM st))
    + (SELECT COUNT(*) FROM (SELECT DISTINCT fact_id, statement_id FROM fx))
    + (SELECT COUNT(*) FROM (SELECT DISTINCT subject_entity_id, fact_id FROM fx))
    + (SELECT COUNT(*) FROM (SELECT DISTINCT object_entity_id, fact_id FROM fx))
    + (SELECT COUNT(*) FROM prev) AS n
)
SELECT 'sources' AS table_name, COUNT(DISTINCT source_id) AS n_rows FROM ch
UNION ALL SELECT 'chunks', COUNT(DISTINCT chunk_id) FROM ch
UNION ALL SELECT 'topics', COUNT(DISTINCT topic_id) FROM st
UNION ALL SELECT 'statements', COUNT(DISTINCT statement_id) FROM st
UNION ALL SELECT 'facts', COUNT(DISTINCT fact_id) FROM fx
UNION ALL SELECT 'entities',
  (SELECT COUNT(DISTINCT subject_entity_id) FROM fx)
  + (SELECT COUNT(DISTINCT object_entity_id) FROM fx)
UNION ALL SELECT 'edges', n FROM edge_counts
"""


QUERIES = {
    "extract_build_statements": extract_build_statements,
    "extract_build_fact_graph": extract_build_fact_graph,
    "extract_build_counts": extract_build_counts,
}

ORACLES = {
    "extract_build_statements": STATEMENTS_ORACLE,
    "extract_build_fact_graph": FACT_GRAPH_ORACLE,
    "extract_build_counts": COUNTS_ORACLE,
}
