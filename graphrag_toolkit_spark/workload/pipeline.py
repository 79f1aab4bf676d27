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
    docs = load(spark, sf_dir, "documents")
    build = indexing.extract_and_build(docs)
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("table_name"), "n_rows"
        )
        for name, df in build.items()
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


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
