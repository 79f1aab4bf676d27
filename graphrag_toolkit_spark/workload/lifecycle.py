"""Lifecycle + processor-chain workload (SURVEY §2.1 S7/S8, §2.4 A5-A7/A9,
§2.7 T4): the sink/versioning/delete machinery and the result-processor chain
exercised end-to-end through the REAL operator code, each with a DuckDB oracle.

These run over the driver's TPC-H-ish fixtures projected onto the lexical-graph
shape (orders → sources, lineitems → chunks/statements, parts → facts), so the
cascade/versioning semantics get hash-level checks without bespoke fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphrag_toolkit_spark.filters import VALID_TO_MAX
from graphrag_toolkit_spark.operators import processors
from graphrag_toolkit_spark.session import load
from graphrag_toolkit_spark.sources import sink


# --- S8: SCD-2 versioning ----------------------------------------------------
# History: one version per (customer, order date); valid_from = epoch millis of
# the order date (day-exact integer arithmetic — no TZ dependence). The real
# ``sink.apply_versions`` closes each version at its successor's valid_from.

_MS_PER_DAY = 86_400_000


def scd2_versioning_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    history = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderkey").alias("version_id"))
        .select(
            F.col("o_custkey").alias("logical_id"),
            "version_id",
            (
                F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
                .cast("long") * _MS_PER_DAY
            ).alias("valid_from"),
        )
    )
    versioned = sink.apply_versions(history, "logical_id")
    return versioned.withColumn(
        "is_current", F.col("valid_to") == F.lit(VALID_TO_MAX)
    )


SCD2_ORACLE = f"""
WITH hist AS (
  SELECT o_custkey AS logical_id, MIN(o_orderkey) AS version_id,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) * {_MS_PER_DAY} AS valid_from
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT logical_id, version_id, valid_from,
       COALESCE(LEAD(valid_from) OVER (PARTITION BY logical_id ORDER BY valid_from),
                {VALID_TO_MAX}) AS valid_to,
       COALESCE(LEAD(valid_from) OVER (PARTITION BY logical_id ORDER BY valid_from),
                {VALID_TO_MAX}) = {VALID_TO_MAX} AS is_current
FROM hist
"""


# --- S7: cascading delete ----------------------------------------------------
# Project the fixtures onto the graph shape the reference deletes over
# (delete_sources.py:51-230): sources=orders, chunks/statements=lineitems,
# facts=parts, SUPPORTS/EXTRACTED_FROM edges. Delete all pre-1997 orders and
# report surviving row counts per table — the orphan check (a part survives
# iff some surviving statement still references it) is what's under test.

# fixture order dates span 1995-01-01 .. 2001-08-01 — the 1997-01-01 cutoff
# deletes the first two of ~6.5 years, a real ~30% prefix of the corpus
_DELETE_CUTOFF = "1997-01-01"


def cascade_delete_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")

    sources = orders.select(
        F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("source_id")
    )
    chunk_id = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    chunks = li.select(
        F.concat(F.lit("ch"), chunk_id).alias("chunk_id"),
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("source_id"),
    )
    statements = li.select(
        F.concat(F.lit("st"), chunk_id).alias("statement_id"),
        F.concat(F.lit("ch"), chunk_id).alias("chunk_id"),
    )
    facts = part.select(
        F.concat(F.lit("p"), F.col("p_partkey").cast("string")).alias("fact_id")
    )
    supports = li.select(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("src"),
        F.concat(F.lit("st"), chunk_id).alias("dst"),
        F.lit("SUPPORTS").alias("etype"),
    )
    extracted = li.select(
        F.concat(F.lit("ch"), chunk_id).alias("src"),
        F.concat(F.lit("o"), F.col("l_orderkey").cast("string")).alias("dst"),
        F.lit("EXTRACTED_FROM").alias("etype"),
    )
    edges = supports.unionByName(extracted)
    delete_ids = orders.filter(
        F.col("o_orderdate") < F.lit(_DELETE_CUTOFF).cast("timestamp")
    ).select(F.concat(F.lit("o"), F.col("o_orderkey").cast("string")).alias("source_id"))

    after = sink.delete_sources(sources, chunks, statements, facts, edges, delete_ids)
    counts = [
        df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("table_name"), "n_rows"
        )
        for name, df in after.items()
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


CASCADE_ORACLE = f"""
WITH surviving AS (
  SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '{_DELETE_CUTOFF}'
),
surv_li AS (
  SELECT l.* FROM lineitem l JOIN surviving s ON l.l_orderkey = s.o_orderkey
)
SELECT 'sources' AS table_name, COUNT(*) AS n_rows FROM surviving
UNION ALL SELECT 'chunks', COUNT(*) FROM surv_li
UNION ALL SELECT 'statements', COUNT(*) FROM surv_li
UNION ALL SELECT 'facts', COUNT(DISTINCT l_partkey) FROM surv_li
UNION ALL SELECT 'edges', 2 * COUNT(*) FROM surv_li
"""


# --- T4: token-budget truncation ---------------------------------------------

TOKEN_BUDGET = 20_000


def token_budget_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    flat = docs.select(
        F.col("doc_id").alias("statement_id"),
        F.col("text").alias("value"),
        F.col("n_chars").cast("double").alias("score"),
    )
    kept = processors.truncate_by_tokens(TOKEN_BUDGET)(flat)
    return kept.select(F.col("statement_id").alias("doc_id"), "score")


TOKEN_BUDGET_ORACLE = rf"""
SELECT doc_id, score FROM (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
         SUM(len(string_split_regex(text, '\s+')))
           OVER (ORDER BY CAST(n_chars AS DOUBLE) DESC, doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
) WHERE cum <= {TOKEN_BUDGET}
"""


# --- A5/A6/T5/T2/T3: the result-processor chain ------------------------------
# Two weighted retriever branches (all orders at 1.0, urgent orders again at
# 0.5) → dedup-merge (scores sum) → rescore (mean over topics of max statement
# score) → prune below 5% of global max → top-3 statements per topic → top-10
# sources. Scores are floor(totalprice): exact integers/halves in double, so
# every sum is order-insensitive and the hash comparison is bit-exact.

_PRUNE_FACTOR = 0.05
_MAX_PER_TOPIC = 3
_MAX_RESULTS = 10


def processor_chain_statements(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    base = orders.select(
        F.col("o_custkey").alias("source_id"),
        F.col("o_orderpriority").alias("topic_id"),
        F.col("o_orderkey").alias("statement_id"),
        F.floor("o_totalprice").cast("double").alias("score"),
    )
    urgent = base.filter(F.col("topic_id") == "1-URGENT")
    flat = processors.union_weighted([(base, 1.0), (urgent, 0.5)])
    chain = [
        processors.dedup_results,
        processors.rescore_results,
        processors.prune_statements(_PRUNE_FACTOR),
        processors.truncate_statements(_MAX_PER_TOPIC),
        processors.truncate_results(_MAX_RESULTS),
    ]
    out = processors.apply_chain(flat, chain)
    return out.select("source_id", "topic_id", "statement_id", "score", "result_score")


PROCESSOR_CHAIN_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS source_id, o_orderpriority AS topic_id,
         o_orderkey AS statement_id, CAST(floor(o_totalprice) AS DOUBLE) AS score
  FROM orders
),
unioned AS (
  SELECT source_id, topic_id, statement_id, score * 1.0 AS score FROM base
  UNION ALL
  SELECT source_id, topic_id, statement_id, score * 0.5 FROM base
  WHERE topic_id = '1-URGENT'
),
dedup AS (
  SELECT source_id, topic_id, statement_id, SUM(score) AS score
  FROM unioned GROUP BY source_id, topic_id, statement_id
),
topic_max AS (
  SELECT source_id, topic_id, MAX(score) AS tmax FROM dedup GROUP BY source_id, topic_id
),
rescored AS (
  SELECT source_id, SUM(tmax) / COUNT(*) AS result_score FROM topic_max GROUP BY source_id
),
flat AS (
  SELECT d.source_id, d.topic_id, d.statement_id, d.score, r.result_score
  FROM dedup d JOIN rescored r ON d.source_id = r.source_id
),
pruned AS (
  SELECT * FROM flat WHERE score >= {_PRUNE_FACTOR} * (SELECT MAX(score) FROM flat)
),
topped AS (
  SELECT source_id, topic_id, statement_id, score, result_score FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source_id, topic_id
                                 ORDER BY score DESC, statement_id) AS rn
    FROM pruned
  ) WHERE rn <= {_MAX_PER_TOPIC}
),
keep AS (
  SELECT source_id FROM (
    SELECT source_id, SUM(score) AS s FROM topped GROUP BY source_id
    ORDER BY s DESC, source_id LIMIT {_MAX_RESULTS}
  )
)
SELECT t.source_id, t.topic_id, t.statement_id, t.score, t.result_score
FROM topped t JOIN keep k ON t.source_id = k.source_id
"""


# --- A9: exact percentiles ---------------------------------------------------
# avg aggregates in DECIMAL (exact on 2-dec inputs); p50/p95 via exact
# linear-interpolation percentile — Spark ``percentile`` and DuckDB
# ``quantile_cont`` both use the R-7 (n-1)-index rule, so results match
# bit-for-bit on identical input doubles.

def percentile_stats_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(dec).cast("double") / F.count(F.lit(1))).alias("avg_value"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_type")
    )


PERCENTILE_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_value,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# --- A7: class-level schema rollup -------------------------------------------
# The reference's graph summary projects facts onto (subject class, relation,
# object class) and de-dups (graph_summary_builder.py:89-104). Here: supplier
# nation × 'supplies' × part-type head word, with distinct-pair support counts.

def schema_summary_supplies(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part")
    pairs = li.select("l_suppkey", "l_partkey").distinct()
    return (
        # supplier grows with the data — no hint; nation is 25 rows at any SF
        pairs.join(sup, pairs.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(part, pairs.l_partkey == part.p_partkey)
        .select(
            F.col("n_name").alias("subj_class"),
            F.lit("supplies").alias("relation"),
            F.split(F.col("p_type"), " ").getItem(0).alias("obj_class"),
        )
        .groupBy("subj_class", "relation", "obj_class")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


SCHEMA_SUMMARY_ORACLE = """
WITH pairs AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem)
SELECT n.n_name AS subj_class, 'supplies' AS relation,
       string_split(p.p_type, ' ')[1] AS obj_class,
       COUNT(*) AS n_pairs
FROM pairs x
JOIN supplier s ON x.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON x.l_partkey = p.p_partkey
GROUP BY subj_class, relation, obj_class
"""


# --- P4: snapshot predicate over the SCD-2 history ---------------------------
# AT_TIMESTAMP semantics (versioning.py:25-31): the row whose
# [valid_from, valid_to) window contains the snapshot instant, per logical id.

_SNAPSHOT_MS = 10_400 * 86_400_000   # 1998-06-23 — mid-corpus (dates 1995-2001)


def versions_at_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    history = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(F.min("o_orderkey").alias("version_id"))
        .select(
            F.col("o_custkey").alias("logical_id"),
            "version_id",
            (
                F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
                .cast("long") * _MS_PER_DAY
            ).alias("valid_from"),
        )
    )
    versioned = sink.apply_versions(history, "logical_id")
    return sink.versions_at(versioned, _SNAPSHOT_MS).select(
        "logical_id", "version_id", "valid_from", "valid_to"
    )


SNAPSHOT_ORACLE = f"""
WITH hist AS (
  SELECT o_custkey AS logical_id, MIN(o_orderkey) AS version_id,
         datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) * {_MS_PER_DAY} AS valid_from
  FROM orders GROUP BY o_custkey, o_orderdate
),
v AS (
  SELECT logical_id, version_id, valid_from,
         COALESCE(LEAD(valid_from) OVER (PARTITION BY logical_id ORDER BY valid_from),
                  {VALID_TO_MAX}) AS valid_to
  FROM hist
)
SELECT logical_id, version_id, valid_from, valid_to
FROM v WHERE valid_from <= {_SNAPSHOT_MS} AND valid_to > {_SNAPSHOT_MS}
"""


# --- A4: graph-stats histogram -----------------------------------------------
# statements-per-topic histogram over the built lexical graph — the
# reference's connectivity stats (lexical_graph_index.py:662-708).

def statements_per_topic_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from graphrag_toolkit_spark import indexing

    docs = load(spark, sf_dir, "documents")
    stmts = indexing.extract_and_build(docs)["statements"]
    per_topic = stmts.groupBy("topic_id").agg(
        F.count(F.lit(1)).alias("n_statements")
    )
    return per_topic.groupBy("n_statements").agg(
        F.count(F.lit(1)).alias("n_topics")
    )


HISTOGRAM_ORACLE = """
WITH ch AS (
  SELECT 'aws::' || substring(md5(text),1,8) || ':' || substring(md5(meta),1,4)
           || ':' || substring(md5(text || meta),1,8) AS chunk_id,
         string_split(text, ' ') AS ws
  FROM (SELECT text, lang || ';' || source AS meta FROM documents)
),
st AS (
  SELECT DISTINCT topic_id,
         md5('statement::' || topic_id || '::' || value) AS statement_id
  FROM (
    SELECT md5('topic::' || ws[1]) AS topic_id,
           unnest(list_transform(generate_series(0, CAST(ceil(len(ws)/8.0) AS INT) - 1),
                  i -> array_to_string(ws[i*8+1 : i*8+8], ' '))) AS value
    FROM ch
  )
),
per_topic AS (
  SELECT topic_id, COUNT(*) AS n_statements FROM st GROUP BY topic_id
)
SELECT n_statements, COUNT(*) AS n_topics FROM per_topic GROUP BY n_statements
"""


def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changelog apply (`sink.apply_changelog`): a deterministic
    Debezium-style log derived from the orders table — every %100 key gets
    an U (+1000.00 exact decimal), every %200 key a later D (delete wins),
    every %500 key spawns an I under a shifted key — folded onto the base
    snapshot; the full resulting snapshot is hash-compared."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    newprice = (
        F.col("o_totalprice").cast("decimal(12,2)")
        + F.lit("1000.00").cast("decimal(12,2)")
    ).cast("double")
    upd = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(1).alias("seq"),
        F.lit("U").alias("op"),
        F.col("o_orderstatus").alias("o_orderstatus"),
        newprice.alias("o_totalprice"),
    )
    dels = orders.filter(F.col("o_orderkey") % 200 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(2).alias("seq"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    ins = orders.filter(F.col("o_orderkey") % 500 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("key"),
        F.lit(1).alias("seq"),
        F.lit("I").alias("op"),
        F.lit("N").alias("o_orderstatus"),
        F.lit(123.45).alias("o_totalprice"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    base = orders.withColumnRenamed("o_orderkey", "key")
    return sink.apply_changelog(base, changes, "key").withColumnRenamed(
        "key", "o_orderkey"
    )


CDC_ORACLE = """
WITH ch AS (
  SELECT o_orderkey AS key, 1 AS seq, 'U' AS op, o_orderstatus AS st,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST('1000.00' AS DECIMAL(12,2))
              AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'D', NULL, NULL FROM orders WHERE o_orderkey % 200 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 1, 'I', 'N', 123.45
  FROM orders WHERE o_orderkey % 500 = 0
),
last AS (
  SELECT key, op, st, price FROM (
    SELECT key, op, st, price,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
),
base AS (SELECT o_orderkey AS key, o_orderstatus, o_totalprice FROM orders)
SELECT COALESCE(b.key, l.key) AS o_orderkey,
       CASE WHEN l.op IS NOT NULL THEN l.st ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN l.op IS NOT NULL THEN l.price ELSE b.o_totalprice END AS o_totalprice
FROM base b FULL OUTER JOIN last l ON l.key = b.key
WHERE l.op IS NULL OR l.op <> 'D'
"""




def ivm_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (`sink.maintain_aggregate`): the
    per-status (count, exact-decimal revenue) aggregate refreshed from the
    SAME synthetic changelog as `cdc_apply_orders` — base aggregates once,
    only changed keys contribute ±deltas. The oracle recomputes the
    aggregate from the fully folded snapshot, so hash equality PROVES
    incremental == full refresh."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    newprice = (
        F.col("o_totalprice").cast("decimal(12,2)")
        + F.lit("1000.00").cast("decimal(12,2)")
    ).cast("double")
    upd = orders.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("key"), F.lit(1).alias("seq"),
        F.lit("U").alias("op"), F.col("o_orderstatus"),
        newprice.alias("o_totalprice"),
    )
    dels = orders.filter(F.col("o_orderkey") % 200 == 0).select(
        F.col("o_orderkey").alias("key"), F.lit(2).alias("seq"),
        F.lit("D").alias("op"), F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    ins = orders.filter(F.col("o_orderkey") % 500 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("key"), F.lit(1).alias("seq"),
        F.lit("I").alias("op"), F.lit("N").alias("o_orderstatus"),
        F.lit(123.45).alias("o_totalprice"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    base = orders.withColumnRenamed("o_orderkey", "key")
    return sink.maintain_aggregate(
        base, changes, "key", "o_orderstatus", "o_totalprice"
    )


IVM_ORACLE = """
WITH ch AS (
  SELECT o_orderkey AS key, 1 AS seq, 'U' AS op, o_orderstatus AS st,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST('1000.00' AS DECIMAL(12,2))
              AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'D', NULL, NULL FROM orders WHERE o_orderkey % 200 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 1, 'I', 'N', 123.45
  FROM orders WHERE o_orderkey % 500 = 0
),
last AS (
  SELECT key, op, st, price FROM (
    SELECT key, op, st, price,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
),
base AS (SELECT o_orderkey AS key, o_orderstatus, o_totalprice FROM orders),
snap AS (
  SELECT COALESCE(b.key, l.key) AS key,
         CASE WHEN l.op IS NOT NULL THEN l.st ELSE b.o_orderstatus END AS st,
         CASE WHEN l.op IS NOT NULL THEN l.price ELSE b.o_totalprice END AS price
  FROM base b FULL OUTER JOIN last l ON l.key = b.key
  WHERE l.op IS NULL OR l.op <> 'D'
)
SELECT st AS o_orderstatus, COUNT(*) AS n,
       CAST(CAST(SUM(CAST(ROUND(price, 2) AS DECIMAL(18,2))) AS DECIMAL(18,2))
            AS DOUBLE) AS total
FROM snap GROUP BY st
"""


def derive_changelog_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff → CDC feed (`sink.derive_changelog`): diff the base
    orders snapshot against its CDC-applied successor (the
    `cdc_apply_orders` state) and emit the minimal I/U/D log — the
    change-data-feed direction, inverse of `apply_changelog`
    (round-trip invariant pinned in pytest). Hash-compared against a
    full-outer-join diff twin."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), "o_orderstatus", "o_totalprice"
    )
    applied = cdc_apply_orders(spark, sf_dir).withColumnRenamed(
        "o_orderkey", "key"
    )
    return sink.derive_changelog(orders, applied, "key").withColumnRenamed(
        "key", "o_orderkey"
    )


DERIVE_CHANGELOG_ORACLE = """
WITH ch AS (
  SELECT o_orderkey AS key, 1 AS seq, 'U' AS op, o_orderstatus AS st,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) + CAST('1000.00' AS DECIMAL(12,2))
              AS DOUBLE) AS price
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, 2, 'D', NULL, NULL FROM orders WHERE o_orderkey % 200 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, 1, 'I', 'N', 123.45
  FROM orders WHERE o_orderkey % 500 = 0
),
last AS (
  SELECT key, op, st, price FROM (
    SELECT key, op, st, price,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
),
base AS (SELECT o_orderkey AS key, o_orderstatus AS st, o_totalprice AS price FROM orders),
snap AS (
  SELECT COALESCE(b.key, l.key) AS key,
         CASE WHEN l.key IS NOT NULL THEN l.st ELSE b.st END AS st,
         CASE WHEN l.key IS NOT NULL THEN l.price ELSE b.price END AS price
  FROM base b FULL JOIN last l ON b.key = l.key
  WHERE l.op IS NULL OR l.op <> 'D'
),
d AS (
  SELECT COALESCE(o.key, n.key) AS key,
         CASE WHEN o.key IS NULL THEN 'I'
              WHEN n.key IS NULL THEN 'D'
              WHEN o.st IS DISTINCT FROM n.st
                   OR o.price IS DISTINCT FROM n.price THEN 'U' END AS op,
         n.st, n.price
  FROM base o FULL JOIN snap n ON o.key = n.key
)
SELECT key AS o_orderkey, CAST(1 AS INTEGER) AS seq, op,
       CASE WHEN op <> 'D' THEN st END AS o_orderstatus,
       CASE WHEN op <> 'D' THEN price END AS o_totalprice
FROM d WHERE op IS NOT NULL
"""


def ivm_join_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-join view maintenance (`sink.maintain_join`): the materialized
    orders ⋈ customer view refreshed under the same deterministic
    changelog family as `cdc_apply_orders` (U reprices, D deletes, I
    inserts under a shifted key with a remapped customer) — only the
    changelog joins the dimension; hash-compared against recomputing the
    join over the applied changelog."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"), "o_custkey", "o_totalprice"
    )
    dim = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    base_view = orders.join(dim, "o_custkey")
    newprice = (
        F.col("o_totalprice").cast("decimal(12,2)")
        + F.lit("1000.00").cast("decimal(12,2)")
    ).cast("double")
    src = load(spark, sf_dir, "orders")
    upd = src.filter(F.col("o_orderkey") % 100 == 0).select(
        F.col("o_orderkey").alias("key"), "o_custkey",
        newprice.alias("o_totalprice"),
        F.lit(1).alias("seq"), F.lit("U").alias("op"),
    )
    dels = src.filter(F.col("o_orderkey") % 200 == 0).select(
        F.col("o_orderkey").alias("key"),
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(2).alias("seq"), F.lit("D").alias("op"),
    )
    ins = src.filter(F.col("o_orderkey") % 500 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("key"),
        ((F.col("o_orderkey") % 100) + 1).alias("o_custkey"),
        F.lit(123.45).alias("o_totalprice"),
        F.lit(1).alias("seq"), F.lit("I").alias("op"),
    )
    changes = upd.unionByName(dels).unionByName(ins)
    return sink.maintain_join(
        base_view, changes, "key", dim, "o_custkey"
    ).select(
        F.col("key").alias("o_orderkey"), "o_custkey", "o_totalprice",
        "c_name", "c_mktsegment",
    )


IVM_JOIN_ORACLE = """
WITH ch AS (
  SELECT o_orderkey AS key, o_custkey, 1 AS seq, 'U' AS op,
         CAST(CAST(o_totalprice AS DECIMAL(12,2))
              + CAST('1000.00' AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
  UNION ALL
  SELECT o_orderkey, NULL, 2, 'D', NULL FROM orders WHERE o_orderkey % 200 = 0
  UNION ALL
  SELECT o_orderkey + 10000000, (o_orderkey % 100) + 1, 1, 'I', 123.45
  FROM orders WHERE o_orderkey % 500 = 0
),
last AS (
  SELECT key, op, o_custkey, o_totalprice FROM (
    SELECT key, op, o_custkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
    FROM ch
  ) WHERE rn = 1
),
base AS (SELECT o_orderkey AS key, o_custkey, o_totalprice FROM orders),
applied AS (
  SELECT b.key, b.o_custkey, b.o_totalprice
  FROM base b LEFT JOIN last l ON b.key = l.key WHERE l.key IS NULL
  UNION ALL
  SELECT key, o_custkey, o_totalprice FROM last WHERE op <> 'D'
)
SELECT a.key AS o_orderkey, a.o_custkey, a.o_totalprice,
       c.c_name, c.c_mktsegment
FROM applied a JOIN customer c ON a.o_custkey = c.c_custkey
"""


QUERIES = {
    "scd2_versioning_orders": scd2_versioning_orders,
    "ivm_join_orders": ivm_join_orders,
    "derive_changelog_orders": derive_changelog_orders,
    "cdc_apply_orders": cdc_apply_orders,
    "ivm_orders": ivm_orders,
    "versions_at_snapshot": versions_at_snapshot,
    "statements_per_topic_histogram": statements_per_topic_histogram,
    "cascade_delete_counts": cascade_delete_counts,
    "token_budget_truncate": token_budget_truncate,
    "processor_chain_statements": processor_chain_statements,
    "percentile_stats_events": percentile_stats_events,
    "schema_summary_supplies": schema_summary_supplies,
}

ORACLES = {
    "scd2_versioning_orders": SCD2_ORACLE,
    "cdc_apply_orders": CDC_ORACLE,
    "ivm_orders": IVM_ORACLE,
    "ivm_join_orders": IVM_JOIN_ORACLE,
    "derive_changelog_orders": DERIVE_CHANGELOG_ORACLE,
    "versions_at_snapshot": SNAPSHOT_ORACLE,
    "statements_per_topic_histogram": HISTOGRAM_ORACLE,
    "cascade_delete_counts": CASCADE_ORACLE,
    "token_budget_truncate": TOKEN_BUDGET_ORACLE,
    "processor_chain_statements": PROCESSOR_CHAIN_ORACLE,
    "percentile_stats_events": PERCENTILE_ORACLE,
    "schema_summary_supplies": SCHEMA_SUMMARY_ORACLE,
}
