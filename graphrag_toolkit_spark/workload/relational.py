"""Relational core workload: scan/filter/project (P-class), join chains
(J-class), aggregations (A-class), windows/top-k/set ops (T-class) from
SURVEY.md §2, expressed over the driver's TPC-H-ish fixtures.

Each query doubles as the correctness probe for an engine primitive — e.g.
``filter_tree_orders`` compiles a real ``MetadataFilters`` tree through
``filters.to_column`` (the Spark side) and ``filters.to_sql`` (the oracle
side), so the algebra itself is what's under test, not a hand-copied WHERE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark import ids
from graphrag_toolkit_spark.filters import (
    Condition,
    MetadataFilter,
    MetadataFilters,
    Op,
    to_column,
    to_sql,
)
from graphrag_toolkit_spark.functions import text as T
from graphrag_toolkit_spark.session import load


def _dec(col: str, prec: int = 12, scale: int = 2) -> F.Column:
    return F.col(col).cast(f"decimal({prec},{scale})")


# --- A-class: grouped aggregation (TPC-H Q1 shape; SURVEY A1-A4) -------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4))
    charge = disc_price * (F.lit(1).cast("decimal(4,2)") + _dec("l_tax", 4))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(_dec("l_discount", 4)).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --- J-class: join chain + grouped top-k (TPC-H Q3 shape; SURVEY J1-J3) ------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


Q3_ORACLE = """
SELECT
  o_orderkey, o_orderdate, o_orderpriority,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


# --- J-class: 6-way join (TPC-H Q5 shape; SURVEY J2 chain depth) -------------

def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_ORACLE = """
SELECT
  r_name, n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY r_name, n_name
ORDER BY revenue DESC, n_name ASC
"""


# --- P-class: metadata filter algebra compiled both ways (SURVEY P1-P2) ------

_FILTER_TREE = MetadataFilters(
    condition=Condition.OR,
    filters=[
        MetadataFilters(
            condition=Condition.AND,
            filters=[
                MetadataFilter("o_orderstatus", Op.EQ, "O"),
                MetadataFilter("o_totalprice", Op.GT, 150000.0),
            ],
        ),
        MetadataFilters(
            condition=Condition.AND,
            filters=[
                MetadataFilters(
                    condition=Condition.NOT,
                    filters=[
                        MetadataFilter(
                            "o_orderpriority", Op.TEXT_MATCH_INSENSITIVE, "URGENT"
                        )
                    ],
                ),
                MetadataFilter("o_orderpriority", Op.IN, ["2-HIGH", "3-MEDIUM"]),
                MetadataFilter("o_totalprice", Op.LTE, 50000.0),
            ],
        ),
    ],
)


def filter_tree_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return orders.filter(to_column(_FILTER_TREE)).select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )


FILTER_TREE_ORACLE = f"""
SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE {to_sql(_FILTER_TREE)}
"""


# --- §2.8 scalar text functions + content-addressed ids ----------------------

def scalar_text_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        T.search_string(F.col("p_name")).alias("search_str"),
        T.label_from(F.col("p_name")).alias("label"),
        T.relationship_name(F.col("p_type")).alias("rel_name"),
    )


SCALAR_TEXT_ORACLE = r"""
SELECT
  p_partkey,
  lower(trim(regexp_replace(regexp_replace(p_name, '([^\s\w]|_)+', ' ', 'g'), '\s+', ' ', 'g'))) AS search_str,
  array_to_string(
    list_transform(
      string_split(trim(regexp_replace(regexp_replace(p_name, '([^\s\w]|_)+', ' ', 'g'), '\s+', ' ', 'g')), ' '),
      w -> upper(substring(w, 1, 1)) || lower(substring(w, 2))
    ), ' ') AS label,
  upper(regexp_replace(regexp_replace(p_type, '[^0-9A-Za-z]+', '_', 'g'), '^_+|_+$', '', 'g')) AS rel_name
FROM part
"""


def content_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed source/chunk ids minted over the documents table
    (reference id_generator.py semantics; see graphrag_toolkit_spark.ids)."""
    docs = load(spark, sf_dir, "documents")
    sid = ids.source_id(F.col("text"), F.col("source"))
    return docs.select(
        "doc_id",
        sid.alias("source_id"),
        ids.chunk_id(sid, F.col("text"), F.col("source")).alias("chunk_id"),
        ids.content_hash(F.col("text")).alias("text_hash"),
    )


CONTENT_IDS_ORACLE = """
SELECT
  doc_id,
  'aws::' || substring(md5(text), 1, 8) || ':' || substring(md5(source), 1, 4) AS source_id,
  'aws::' || substring(md5(text), 1, 8) || ':' || substring(md5(source), 1, 4)
    || ':' || substring(md5(text || source), 1, 8) AS chunk_id,
  md5(text) AS text_hash
FROM documents
"""


# --- T-class: window top-N per group (SURVEY T2/J8) --------------------------

def topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


TOPN_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
)
WHERE rn <= 3
"""


# --- A1-class: rollup with sorted collected arrays (nested-result shape) -----

def rollup_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_spend"),
            F.concat_ws(
                ",",
                F.transform(
                    F.sort_array(F.collect_list("o_orderkey")),
                    lambda x: x.cast("string"),
                ),
            ).alias("order_keys"),
        )
    )


ROLLUP_ORACLE = """
SELECT
  o_custkey,
  COUNT(*) AS n_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_spend,
  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys
FROM orders
GROUP BY o_custkey
"""


# --- S6-class: anti/semi join (checkpoint-skip semantics) --------------------

def anti_join_orders_without_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


ANTI_JOIN_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
"""


def semi_join_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    urgent = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SEMI_JOIN_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE EXISTS (
  SELECT 1 FROM orders
  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
)
"""


# --- A4-class: table stats (graph stats analog) ------------------------------

def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Node-count / histogram stats (reference lexical_graph_index.py:662-708):
    per-customer order-count histogram — 'how many customers have N orders'."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


TABLE_STATS_ORACLE = """
SELECT n_orders, COUNT(*) AS n_customers
FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
GROUP BY n_orders
ORDER BY n_orders
"""


def cube_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): counts + exact decimal totals at every
    grouping-set level incl. grand total — OLAP rollup surface the engine
    gets from Catalyst for free (single pass, map-side partials per set)."""
    orders = load(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
    )


CUBE_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


PIVOT_PRIORITIES = [
    "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
]


def pivot_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per order status, one count column per priority (fixed
    pivot-value list ⇒ stable schema; Spark evaluates it as conditional
    aggregates in one pass, same as the FILTER-clause oracle)."""
    orders = load(spark, sf_dir, "orders")
    piv = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", PIVOT_PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renames = {p: f"p{p[0]}" for p in PIVOT_PRIORITIES}
    out = piv
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out.fillna(0, subset=list(renames.values()))


PIVOT_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
       COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
       COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
       COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
       COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
FROM orders GROUP BY o_orderstatus
"""


def bloom_filter_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join pruning (`sketch.bloom_build`/
    `bloom_might_contain`): build the filter on urgent-order keys, probe
    every lineitem order key WITHOUT shuffling lineitem, and report the
    2×2 (might_contain × actually_urgent) confusion counts — the
    never-false-negative invariant and the measured FP rate, hash-exact."""
    from graphrag_toolkit_spark.operators import sketch

    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_orderkey").alias("key")
    )
    bloom = sketch.bloom_build(urgent, "key")
    probes = li.select(F.col("l_orderkey").alias("key")).distinct()
    probed = sketch.bloom_might_contain(probes, bloom, "key")
    truth = probed.join(
        urgent.distinct().withColumn("_u", F.lit(1)), "key", "left"
    ).withColumn("actually_urgent", F.col("_u").isNotNull())
    return truth.groupBy("might_contain", "actually_urgent").agg(
        F.count(F.lit(1)).alias("n")
    )


_BLOOM_HASH = (
    "CAST('0x' || substring(md5('bloom' || i || '|' || CAST({key} AS VARCHAR)), 1, 13)"
    " AS BIGINT) % 4096"
)

BLOOM_ORACLE = f"""
WITH hashes(i) AS (VALUES (0), (1), (2), (3), (4)),
urgent AS (SELECT DISTINCT o_orderkey AS key FROM orders
           WHERE o_orderpriority = '1-URGENT'),
pos AS (
  SELECT {_BLOOM_HASH.format(key='key')} AS p FROM urgent, hashes
),
bloom AS (
  SELECT p // 32 AS word_idx,
         bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
  FROM pos GROUP BY p // 32
),
probes AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
pp AS (
  SELECT key, {_BLOOM_HASH.format(key='key')} AS p FROM probes, hashes
),
hit AS (
  SELECT key,
         BOOL_AND((COALESCE(b.word, 0) & (1::BIGINT << CAST(x.p % 32 AS INT))) <> 0)
           AS might_contain
  FROM (SELECT key, p, p // 32 AS widx FROM pp) x
  LEFT JOIN bloom b ON b.word_idx = x.widx
  GROUP BY key
),
truth AS (
  SELECT p.key, (u.key IS NOT NULL) AS actually_urgent
  FROM probes p LEFT JOIN urgent u ON u.key = p.key
)
SELECT h.might_contain, t.actually_urgent, COUNT(*) AS n
FROM hit h JOIN truth t USING (key)
GROUP BY h.might_contain, t.actually_urgent
"""


def decile_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency bucketing: NTILE(10) deciles of order value under a
    total order, with per-decile counts and exact decimal sums/bounds.

    Scale shape: NO single-partition window — the two-phase distributed
    rank (operators/ranks.py): equi-width price buckets, broadcast
    cumulative bucket offsets, per-bucket partitioned row_number, then the
    all-integer NTILE reconstruction from (rank, n) — value-identical to
    the built-in NTILE, but the sort parallelizes across buckets."""
    from graphrag_toolkit_spark.operators import ranks

    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    orders = orders.localCheckpoint(eager=False)  # bounds/offsets/rank legs
    ranked = ranks.two_phase_row_number(
        ranks.with_range_bucket(orders, F.col("o_totalprice")),
        [F.asc("o_totalprice"), F.asc("o_orderkey")],
        total_col="__n",
    )
    return (
        ranked.withColumn(
            "decile", ranks.ntile_from_rank(F.col("rn"), F.col("__n"), 10)
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
        )
    )


DECILE_ORACLE = """
SELECT decile, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
GROUP BY decile
"""


def validate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (`operators/validate.py`): null/domain/range/
    regex/uniqueness/referential rules over orders compiled into one
    conditional-count scan + one groupBy + one FK anti-join; the report
    (rule, n_violations, n_rows) is what a publish step would assert on."""
    from graphrag_toolkit_spark.operators import validate as V

    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    rules = [
        V.not_null("o_orderkey"),
        V.in_set("o_orderstatus", ["O", "F", "P"]),
        V.in_range("o_totalprice", 0.0, 1_000_000.0),
        V.regexp("o_orderpriority", "^[1-5]-"),
        V.unique("o_orderkey"),
        V.foreign_key("o_custkey", customer, "c_custkey"),
    ]
    return V.validate(orders, rules)


VALIDATE_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
SELECT 'not_null_o_orderkey' AS rule,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS n_violations,
       n_rows FROM n
UNION ALL
SELECT 'in_set_o_orderstatus',
       (SELECT COUNT(*) FROM orders
        WHERE o_orderstatus IS NULL OR o_orderstatus NOT IN ('O', 'F', 'P')),
       n_rows FROM n
UNION ALL
SELECT 'range_o_totalprice',
       (SELECT COUNT(*) FROM orders
        WHERE o_totalprice IS NULL OR o_totalprice < 0.0
           OR o_totalprice > 1000000.0),
       n_rows FROM n
UNION ALL
SELECT 'regexp_o_orderpriority',
       (SELECT COUNT(*) FROM orders
        WHERE o_orderpriority IS NULL
           OR NOT regexp_matches(o_orderpriority, '^[1-5]-')),
       n_rows FROM n
UNION ALL
SELECT 'unique_o_orderkey',
       (SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) FROM
         (SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey) WHERE c > 1),
       n_rows FROM n
UNION ALL
SELECT 'fk_o_custkey',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
       n_rows FROM n
"""


def unpivot_orders_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): fold the pivoted per-priority count columns back to
    long form — the wide→long inverse of `pivot_orders_by_priority`, via
    Spark's native `unpivot` against a manual UNION oracle."""
    wide = pivot_orders_by_priority(spark, sf_dir)
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=[f"p{i}" for i in range(1, 6)],
        variableColumnName="priority_bucket",
        valueColumnName="n",
    )


UNPIVOT_ORACLE = f"""
WITH wide AS ({PIVOT_ORACLE})
SELECT o_orderstatus, 'p1' AS priority_bucket, p1 AS n FROM wide
UNION ALL SELECT o_orderstatus, 'p2', p2 FROM wide
UNION ALL SELECT o_orderstatus, 'p3', p3 FROM wide
UNION ALL SELECT o_orderstatus, 'p4', p4 FROM wide
UNION ALL SELECT o_orderstatus, 'p5', p5 FROM wide
"""


def percent_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK / CUME_DIST per status under a total order — both are
    exact integer ratios ((rank−1)/(n−1), rank/n), so the full per-row
    distribution positions hash-match."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


PERCENT_RANK_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
"""


def rfm_segments_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer recency (days since last order,
    against the corpus max date), frequency (order count), monetary
    (exact decimal total) + NTILE(5) scores per dimension under total
    orders — the classic customer-analytics rollup."""
    orders = load(spark, sf_dir, "orders")
    maxd = orders.agg(F.max("o_orderdate").alias("m"))
    per_c = (
        orders.crossJoin(F.broadcast(maxd))
        .groupBy("o_custkey")
        .agg(
            F.min(
                F.datediff(F.col("m"), F.col("o_orderdate"))
            ).alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("monetary"),
        )
    )
    # Three exact NTILE(5) scores without a single single-partition window
    # (operators/ranks.py): each score is a NARROW (custkey, key) leg ranked
    # by the two-phase distributed rank, joined back on the customer key.
    from graphrag_toolkit_spark.operators import ranks

    per_c = per_c.localCheckpoint(eager=False)  # 3 score legs + spine read it

    def score_leg(col: str, asc: bool, name: str) -> DataFrame:
        leg = per_c.select("o_custkey", col)
        bucket_key = F.col(col) if asc else -F.col(col)
        order = [F.asc(col) if asc else F.desc(col), F.asc("o_custkey")]
        # customer-sized; the rank reads it twice (offsets + final join)
        bucketed = ranks.with_range_bucket(leg, bucket_key).localCheckpoint(
            eager=False
        )
        ranked = ranks.two_phase_row_number(bucketed, order, total_col="__n")
        return ranked.select(
            "o_custkey",
            ranks.ntile_from_rank(F.col("rn"), F.col("__n"), 5).alias(name),
        )

    return (
        per_c.join(score_leg("recency_days", True, "r_score"), "o_custkey")
        .join(score_leg("frequency", False, "f_score"), "o_custkey")
        .join(score_leg("monetary", False, "m_score"), "o_custkey")
        .select(
            "o_custkey", "recency_days", "frequency", "monetary",
            "r_score", "f_score", "m_score",
        )
    )


RFM_ORACLE = """
WITH maxd AS (SELECT MAX(o_orderdate) AS m FROM orders),
per_c AS (
  SELECT o_custkey,
         MIN(datediff('day', o_orderdate, maxd.m)) AS recency_days,
         COUNT(*) AS frequency,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE)
           AS monetary
  FROM orders, maxd GROUP BY o_custkey
)
SELECT o_custkey, recency_days, frequency, monetary,
       NTILE(5) OVER (ORDER BY recency_days, o_custkey) AS r_score,
       NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
       NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
FROM per_c
"""


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax aggregation parity: the latest order per customer in ONE
    aggregate via MAX over a totally-ordered struct (date, key leading) —
    no window, no self-join; struct comparison is lexicographic in both
    engines, and (date, orderkey) is unique so the pick is deterministic."""
    orders = load(spark, sf_dir, "orders")
    pick = F.max(
        F.struct(F.col("o_orderdate"), F.col("o_orderkey"), F.col("o_totalprice"))
    )
    return orders.groupBy("o_custkey").agg(
        pick.getField("o_orderkey").alias("latest_orderkey"),
        pick.getField("o_totalprice").alias("latest_totalprice"),
        F.max("o_orderdate").alias("latest_date"),
    )


ARG_MAX_ORACLE = """
WITH m AS (
  SELECT o_custkey,
         MAX(struct_pack(d := o_orderdate, k := o_orderkey,
                         p := o_totalprice)) AS s,
         MAX(o_orderdate) AS latest_date
  FROM orders GROUP BY o_custkey
)
SELECT o_custkey, s.k AS latest_orderkey, s.p AS latest_totalprice, latest_date
FROM m
"""


def calendar_stats_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar feature extraction: orders bucketed by (year, month,
    ISO day-of-week) with counts and exact decimal totals — the date-part
    parity check (year/month/dow semantics align across engines when dow
    is pinned to ISO Monday=1)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
    )


CALENDAR_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS y,
       CAST(month(o_orderdate) AS INT) AS m,
       CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow_sun1,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM orders GROUP BY y, m, dow_sun1
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the pure-scan aggregate —
    every predicate pushes to the parquet scan, the sum is a single
    map-side-combined DECIMAL aggregate, no join and no wide shuffle.
    Discount is quantized to its 2-decimal domain so the price×discount
    product is exact."""
    li = load(spark, sf_dir, "lineitem")
    d = F.round(F.col("l_discount"), 2).cast("decimal(4,2)")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.round(F.col("l_discount"), 2).between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(12,2)") * d)
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q6_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(ROUND(l_discount, 2) AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND ROUND(l_discount, 2) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""




def target_encode_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding (`features.target_encode`): each
    order's priority class encoded as the mean total price of the OTHER
    orders in its class — the classic high-cardinality categorical feature
    with the leakage guard in the formula itself."""
    from graphrag_toolkit_spark.operators.features import target_encode

    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    return target_encode(orders, "o_orderpriority", "o_totalprice").select(
        "o_orderkey", "o_orderpriority", "te_o_orderpriority"
    )


TARGET_ENCODE_ORACLE = """
WITH q AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2)) AS y
  FROM orders
),
stats AS (
  SELECT o_orderpriority,
         CAST(SUM(y) AS DECIMAL(38,2)) AS cat_sum,
         COUNT(*) AS cat_n
  FROM q GROUP BY o_orderpriority
),
gl AS (SELECT CAST(SUM(y) AS DECIMAL(38,2)) AS g_sum, COUNT(*) AS g_n FROM q)
SELECT q.o_orderkey, q.o_orderpriority,
       CASE WHEN s.cat_n - 1 > 0
            THEN CAST(s.cat_sum - q.y AS DOUBLE) / (s.cat_n - 1)
            ELSE CAST(g.g_sum AS DOUBLE) / g.g_n END AS te_o_orderpriority
FROM q JOIN stats s ON s.o_orderpriority = q.o_orderpriority, gl g
"""




def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order-priority checking): orders in a quarter with at
    least one late lineitem, counted per priority — the canonical EXISTS
    → left-semi-join shape (the lineitem side never duplicates orders,
    and only the two join keys are scanned from it)."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    late = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    # fixture has no commitdate/receiptdate; "late" = shipped after the
    # quarter the order was placed in (a deterministic stand-in predicate
    # over the columns the fixture does have)
    sel = orders.join(
        late.filter(F.col("l_shipdate") >= F.lit("1997-07-01").cast("timestamp")),
        orders.o_orderkey == late.l_orderkey,
        "left_semi",
    )
    return (
        sel.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate >= TIMESTAMP '1997-07-01'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""




def rollup_grouping_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical ROLLUP with grouping markers: (status, priority) →
    status subtotals → grand total in ONE pass (Catalyst expands the
    grouping sets; each level partial-aggregates map-side). grouping_id
    disambiguates real NULLs from subtotal rows — the OLAP-correct way."""
    orders = load(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total"),
            F.grouping_id().alias("gid"),
        )
    )


ROLLUP_GROUPING_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS total,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""




def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping-mode priority classes): join lineitem→
    orders in a date window, conditional counts of urgent vs non-urgent
    orders per return flag (the fixture's stand-in for shipmode) — the
    canonical join + CASE-aggregate."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_ORACLE = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion revenue share): the ratio of discounted
    revenue from 'red'-named parts in one month — conditional decimal sum
    over unconditional decimal sum, one broadcast part join, exact
    operands into the final division."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4)
    )
    promo = F.col("p_name").startswith("red")
    j = li.join(part, li.l_partkey == part.p_partkey)
    return j.agg(
        (
            F.lit(100.0)
            * F.sum(F.when(promo, rev).otherwise(F.lit(0).cast("decimal(16,4)")))
            .cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q14_ORACLE = """
SELECT 100.0 * CAST(SUM(CASE WHEN p_name LIKE 'red%'
                        THEN CAST(l_extendedprice AS DECIMAL(12,2))
                             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                        ELSE CAST(0 AS DECIMAL(16,4)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate < TIMESTAMP '1997-07-01'
"""




def ship_lag_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-lag distribution: days from order to each line's ship
    date, exact percentiles per order priority — the operations SLA
    metric (join + integer day lag + exact quantiles on integers)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag_days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_orderpriority", lag_days.alias("lag_days")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lag_days").alias("lag_min"),
        F.expr("percentile(lag_days, 0.5)").alias("lag_p50"),
        F.expr("percentile(lag_days, 0.95)").alias("lag_p95"),
        F.max("lag_days").alias("lag_max"),
    ).orderBy("o_orderpriority")


SHIP_LAG_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS n,
       MIN(lag_days) AS lag_min,
       quantile_cont(lag_days, 0.5) AS lag_p50,
       quantile_cont(lag_days, 0.95) AS lag_p95,
       MAX(lag_days) AS lag_max
FROM (
  SELECT o_orderpriority, date_diff('day', o_orderdate, l_shipdate) AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""




def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness/cardinality profile (`operators/profile.py`):
    null counts and exact distinct counts for every orders column, fused
    into ONE scan — the publish-time table audit (the ANALYZE/dbt-test
    analog `validate` rules are written against)."""
    from graphrag_toolkit_spark.operators.profile import profile_table

    return profile_table(load(spark, sf_dir, "orders"))


PROFILE_ORACLE = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM orders)
SELECT 'o_orderkey' AS column, n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS n_nulls,
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderkey IS NULL) AS DOUBLE) / n_rows AS null_frac,
       (SELECT COUNT(DISTINCT o_orderkey) FROM orders) AS n_distinct FROM n
UNION ALL
SELECT 'o_custkey', n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL),
       CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS DOUBLE) / n_rows,
       (SELECT COUNT(DISTINCT o_custkey) FROM orders) FROM n
UNION ALL
SELECT 'o_orderstatus', n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NULL),
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderstatus IS NULL) AS DOUBLE) / n_rows,
       (SELECT COUNT(DISTINCT o_orderstatus) FROM orders) FROM n
UNION ALL
SELECT 'o_totalprice', n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL),
       CAST((SELECT COUNT(*) FROM orders WHERE o_totalprice IS NULL) AS DOUBLE) / n_rows,
       (SELECT COUNT(DISTINCT o_totalprice) FROM orders) FROM n
UNION ALL
SELECT 'o_orderdate', n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL),
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderdate IS NULL) AS DOUBLE) / n_rows,
       (SELECT COUNT(DISTINCT o_orderdate) FROM orders) FROM n
UNION ALL
SELECT 'o_orderpriority', n_rows,
       (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL),
       CAST((SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL) AS DOUBLE) / n_rows,
       (SELECT COUNT(DISTINCT o_orderpriority) FROM orders) FROM n
"""




def weighted_median_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median per return flag: the smallest extended price
    whose cumulative QUANTITY weight reaches half the total — the
    volume-weighted percentile (plain medians mislead when line sizes vary
    wildly). Exact decimal cumulative weights under a total order; no
    interpolation, so the statistic is engine-identical by construction."""
    from pyspark.sql.window import Window as W

    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("v"),
        F.round(F.col("l_quantity"), 2).cast("decimal(14,2)").alias("w"),
    )
    g = li.groupBy("l_returnflag", "v").agg(F.sum("w").alias("w"))
    win = (
        W.partitionBy("l_returnflag")
        .orderBy("v")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    cum = g.withColumn("cumw", F.sum("w").over(win))
    tot = g.groupBy("l_returnflag").agg(F.sum("w").alias("totw"))
    j = cum.join(tot, "l_returnflag").filter(
        F.col("cumw") * 2 >= F.col("totw")
    )
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.min("v").alias("weighted_median"),
            F.max(F.col("totw").cast("double")).alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


WEIGHTED_MEDIAN_ORACLE = """
WITH g AS (
  SELECT l_returnflag, l_extendedprice AS v,
         SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(14,2))) AS w
  FROM lineitem GROUP BY l_returnflag, l_extendedprice
),
cum AS (
  SELECT l_returnflag, v, w,
         SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM g
),
tot AS (SELECT l_returnflag, SUM(w) AS totw FROM g GROUP BY l_returnflag)
SELECT c.l_returnflag,
       MIN(c.v) AS weighted_median,
       CAST(MAX(t.totw) AS DOUBLE) AS total_weight
FROM cum c JOIN tot t ON t.l_returnflag = c.l_returnflag
WHERE c.cumw * 2 >= t.totw
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
"""



def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter — 3-way fact join + broadcast
    nation dim, decimal revenue rounded in-domain, total order before the
    limit."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(revenue, 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicate): revenue
    from three brand × size-band × quantity-band alternatives — the
    classic OR-of-ANDs predicate Catalyst must keep join-convertible
    (common conjunct `l_partkey = p_partkey` stays an equi-join; the
    disjunction evaluates post-join). Adapted to this schema's columns
    (no container/shipmode in the -ish tables)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    q = F.col("l_quantity")
    alt = (
        ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
           & q.between(20, 30))
    )
    revenue = F.sum(
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4))
    )
    return j.filter(alt).agg(
        F.round(revenue, 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q19_ORACLE = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2)
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order-count distribution): LEFT join so
    zero-order customers land in the c_count=0 bucket, then a second
    aggregation over the first — the classic histogram-of-groupBy."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_ORACLE = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): average yearly
    revenue lost if small orders (below 20% of the part's mean quantity)
    were not taken — the correlated-scalar-subquery shape, decorrelated
    into a per-part aggregate + self-join. Exactness: quantities are
    integer-valued doubles, so per-part sums and the s/n mean are IEEE
    identical; the 0.2× threshold uses the same literal in both engines;
    the revenue sum is decimal, divided by 7.0 on exact operands."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    avg_q = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_q.withColumnRenamed("l_partkey", "p_partkey"), "p_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


Q17_ORACLE = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (SELECT l_partkey AS pk, SUM(l_quantity) / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey) a ON a.pk = p_partkey
WHERE p_brand = 'Brand#23' AND l_quantity < 0.2 * avg_qty
"""


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds a threshold (HAVING over a join), re-joined to the
    customer — top-20 by total price then order date."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            _dec("o_totalprice", 14).cast("double").alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(20)
    )


Q18_ORACLE = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(14,2)) AS DOUBLE) AS o_totalprice,
       sum_qty
FROM (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150) b
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 20
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping between two nations): revenue on
    lineitems where the supplier sits in one nation and the ordering
    customer in another of a 3-nation set, grouped by the pair and ship
    year — two dimension-chain joins into one fact scan, a disjunctive
    cross-nation predicate, exact decimal revenue."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    ))
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4)
    )
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            F.col("supp_nation").isin("NATION_1", "NATION_2", "NATION_3")
            & F.col("cust_nation").isin("NATION_1", "NATION_2", "NATION_3")
            & (F.col("supp_nation") != F.col("cust_nation"))
        )
    )
    return (
        j.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"),
             F.count(F.lit(1)).alias("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_ORACLE = """
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-average account balance and no RECENT orders (none since
    2000-01-01; every fixture customer has some order) — a scalar aggregate
    subquery feeding a filter plus an anti join, grouped by a derived
    country-code prefix. Exactness: acctbal is 2-decimal; the average is
    an exact decimal sum over a bigint count, compared in the double
    domain on identical operands."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0)
    avg_bal = pos.agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1)))
        .alias("avg_bal")
    )
    rich = cust.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal").cast("double") > F.col("avg_bal")
    )
    recent = orders.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    no_orders = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy((F.col("c_custkey") % 10).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(_dec("c_acctbal")), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_ORACLE = """
WITH avg_bal AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS a
  FROM customer WHERE c_acctbal > 0
)
SELECT c_custkey % 10 AS cntrycode,
       COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS totacctbal
FROM customer, avg_bal
WHERE CAST(c_acctbal AS DOUBLE) > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_custkey % 10
ORDER BY cntrycode
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation and
    order year on parts whose name contains a token — adapted to the -ish
    schema (no partsupp: supply cost := 60% of retail price), so profit =
    rev − qty·0.6·p_retailprice, all decimal-exact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("blue"))
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4)
    )
    cost = (
        F.lit("0.60").cast("decimal(4,2)")
        * _dec("p_retailprice")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(F.sum((rev - cost).cast("decimal(22,4)")), 2)
            .cast("double").alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(ROUND(SUM(CAST(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         - CAST(0.60 AS DECIMAL(4,2)) * CAST(p_retailprice AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))
       AS DECIMAL(22,4))), 2) AS DOUBLE) AS sum_profit,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%blue%'
GROUP BY n_name, year(o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier, then
    the supplier(s) achieving the GLOBAL max — the aggregate-view +
    max-of-aggregate self-reference the original expresses with a VIEW;
    here a broadcast of the 1-row max joined back on exact decimals (the
    equality compares decimal to decimal, never doubles)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    rev = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4)
    )
    per_s = li.groupBy("l_suppkey").agg(
        F.sum(rev.cast("decimal(20,4)")).alias("total_rev")
    )
    mx = per_s.agg(F.max("total_rev").alias("mx"))
    return (
        per_s.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(supp, per_s.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("total_rev"), 2).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_ORACLE = """
WITH revenue AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
             AS DECIMAL(20,4))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): NATION_1 suppliers' share of
    revenue on 'widget' parts ordered by ASIA customers, per order year —
    a conditional-sum over total-sum ratio with two dimension chains into
    one fact scan. The share divides two exact decimal sums in the double
    domain (identical operands both engines)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    part = load(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    cust_nations = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    supp_nation = F.broadcast(
        nation.select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    rev = (
        _dec("l_extendedprice")
        * (F.lit(1).cast("decimal(4,2)") - _dec("l_discount", 4))
    ).cast("decimal(20,4)")
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(cust_nations, F.col("c_nationkey") == F.col("c_nk"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(supp_nation, F.col("s_nationkey") == F.col("s_nk"))
    )
    zero = F.lit(0).cast("decimal(20,4)")
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_1", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("o_year")
    )


Q8_ORACLE = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN rev
                ELSE CAST(0 AS DECIMAL(20,4)) END) AS DOUBLE)
         / CAST(SUM(rev) AS DOUBLE) AS mkt_share,
       COUNT(*) AS n_lines
FROM (
  SELECT o_orderdate, s_nationkey,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
              AS DECIMAL(20,4)) AS rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE r_name = 'ASIA' AND p_name LIKE '%widget%'
) t
JOIN nation n2 ON t.s_nationkey = n2.n_nationkey
GROUP BY year(o_orderdate)
ORDER BY o_year
"""

ZORDER_ROWS_PER_FILE = 256
ZORDER_EPOCH = "1995-01-01"


def zorder_layout_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER primitive (`packing.zorder_layout`): lay orders out
    by the Morton interleave of (o_custkey, order-day) and report each
    256-row file's min/max envelope on both columns — the data-skipping
    manifest. Both dims stay < 2^16 across the fixture family (custkey
    ≤ 150k·SF, day span ≈ 3500); production callers feed ntile ranks.
    All-integer arithmetic, hash-gated against the same interleave in
    DuckDB."""
    from graphrag_toolkit_spark.operators.packing import zorder_layout

    orders = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff(F.col("o_orderdate"), F.lit(ZORDER_EPOCH))
        .cast("long")
        .alias("day"),
        "o_orderkey",
    )
    return zorder_layout(
        orders, "ck", "day", "o_orderkey", rows_per_file=ZORDER_ROWS_PER_FILE
    )


def _zorder_oracle() -> str:
    from graphrag_toolkit_spark.operators.packing import morton_sql

    z = morton_sql("x", "y", bits=16, floordiv="//")
    return f"""
WITH pts AS (
  SELECT CAST(o_custkey AS BIGINT) AS x,
         CAST(CAST(o_orderdate AS DATE) - DATE '{ZORDER_EPOCH}' AS BIGINT) AS y,
         o_orderkey AS tb
  FROM orders
),
zc AS (SELECT x, y, tb, {z} AS z FROM pts),
rk AS (SELECT x, y, ROW_NUMBER() OVER (ORDER BY z, tb) AS rn FROM zc)
SELECT CAST((rn - 1) // {ZORDER_ROWS_PER_FILE} AS BIGINT) AS file_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y
FROM rk
GROUP BY 1
"""


ZORDER_ORACLE = _zorder_oracle()


def pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query (`features.pareto_frontier`): the largest-size,
    lowest-price part frontier — no part on it is beaten on both axes.
    Distinct points + tie counts; exact comparisons only."""
    from graphrag_toolkit_spark.operators.features import pareto_frontier

    return pareto_frontier(load(spark, sf_dir, "part"), "p_size", "p_retailprice")


PARETO_ORACLE = """
WITH pts AS (
  SELECT p_size AS x, p_retailprice AS y, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM part GROUP BY 1, 2
),
per_x AS (SELECT x, MIN(y) AS min_y FROM pts GROUP BY x),
keep AS (
  SELECT x, min_y AS y FROM (
    SELECT x, min_y,
           MIN(min_y) OVER (ORDER BY x DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS best_higher
    FROM per_x
  ) WHERE best_higher IS NULL OR min_y < best_higher
)
SELECT p.x, p.y, p.n_rows FROM pts p JOIN keep USING (x, y)
"""


# --- TPC-H Q2/Q11/Q16/Q20/Q21 shapes: correlated / nested subqueries ---------
#
# The fixtures have no partsupp table, so the classic partsupp-backed queries
# are re-grounded on the (l_partkey, l_suppkey) pairs observed in lineitem —
# the same correlated-subquery SHAPES (min-per-group join-back, scalar-subquery
# HAVING, NOT IN anti-join, correlated EXISTS / NOT EXISTS) over the available
# tables. Spark has no correlated-subquery executor to lean on; each shape is
# decorrelated by hand into aggregate + join-back, which is exactly what a
# 100 TB plan wants anyway (one shuffle per aggregate, broadcast dims).


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for STANDARD parts of size 10-20,
    the EUROPE supplier(s) offering the part at its minimum observed price —
    the correlated ``MIN`` subquery decorrelated into a per-part aggregate
    broadcast-joined back on exact-decimal equality. Supply cost stands in as
    ``MIN(l_extendedprice)`` per (part, supplier) pair since the -ish schema
    has no partsupp."""
    part = load(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    eu_supp = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = load(spark, sf_dir, "lineitem")
    # Per-(part, supplier) min price over eligible region suppliers and the
    # filtered parts only — the part filter rides the correlation key, so
    # restricting before the min is equivalent to the correlated original.
    pairs = (
        li.join(part.select("p_partkey", "p_name"),
                li.l_partkey == F.col("p_partkey"))
        .join(eu_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name",
                 "s_acctbal", "n_name")
        .agg(F.min(_dec("l_extendedprice")).alias("supply_cost"))
        # the decorrelated min probes pairs AND joins back onto it: without a
        # lineage break the lineitem 3-way join-aggregate executes twice
        .localCheckpoint(eager=False)
    )
    min_cost = pairs.groupBy(F.col("p_partkey").alias("mc_pk")).agg(
        F.min("supply_cost").alias("min_cost")
    )
    return (
        pairs.join(
            min_cost,
            (pairs.p_partkey == F.col("mc_pk"))
            & (pairs.supply_cost == F.col("min_cost")),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
    )


Q2_ORACLE = """
WITH pairs AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS supply_cost
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
  GROUP BY 1, 2, 3, 4, 5, 6
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       CAST(supply_cost AS DOUBLE) AS supply_cost
FROM pairs p1
WHERE supply_cost = (SELECT MIN(supply_cost) FROM pairs p2
                     WHERE p2.p_partkey = p1.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
"""


def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock value): per-part sales value through
    NATION_3 suppliers, keeping parts whose value exceeds
    the nation's MEAN per-part value (×2) — the scalar-subquery HAVING
    decorrelated into a 1-row broadcast. TPC-H scales its fraction by 1/SF;
    a mean-relative threshold is the scale-free equivalent, and the compare
    cross-multiplies (value × n_parts > 2 × total) so it stays exact decimal
    with no division in either engine."""
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    # one-nation supplier key set still grows with SF (supplier/25 rows) —
    # no hint; AQE broadcasts while it fits (surfaced by the round-8
    # STRUCTURAL audit: the flat scan was satisfied by nation's const scan
    # inside this very subtree)
    n5 = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    scoped = li.join(n5, li.l_suppkey == F.col("s_suppkey"))
    per_part = scoped.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice")).cast("decimal(20,2)").alias("value")
    )
    total = per_part.agg(
        F.sum(F.col("value")).cast("decimal(24,2)").alias("total"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value") * F.col("n_parts").cast("decimal(12,0)")
            > F.col("total") * F.lit(2).cast("decimal(2,0)")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value"), 2).cast("double").alias("value"),
        )
        .orderBy(F.desc("value"), "p_partkey")
    )


Q11_ORACLE = """
WITH scoped AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(12,2)) AS px
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
),
per_part AS (
  SELECT l_partkey, CAST(SUM(px) AS DECIMAL(20,2)) AS value
  FROM scoped GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(ROUND(value, 2) AS DOUBLE) AS value
FROM per_part
WHERE value * (SELECT CAST(COUNT(*) AS DECIMAL(12,0)) FROM per_part)
      > (SELECT CAST(SUM(value) AS DECIMAL(24,2)) FROM per_part)
        * CAST(2 AS DECIMAL(2,0))
ORDER BY value DESC, p_partkey
"""


def q16_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier count
    per (brand, type, size) over observed (part, supplier) pairs, excluding
    Brand#1 / PROMO / off-list sizes and NOT-IN-excluding suppliers with a
    negative account balance (the 'complaints' stand-in) — the NOT IN
    subquery expressed as a broadcast anti-join."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
    )
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("bad_sk"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == F.col("bad_sk"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 24, 29, 34, 39, 44, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): ASIA suppliers that
    dominated some 'red' part's 1997 volume — shipped more than half the
    part's total (the correlated ``0.5 × SUM`` scalar subquery, decorrelated
    to a per-part total joined back; the half-compare is 2·qty_sp > qty_p in
    exact decimals, no division). IN-subquery becomes a distinct semi-join."""
    part_red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").contains("red"))
        .select("p_partkey")
    )
    li97 = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(part_red, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_suppkey", "l_partkey", _dec("l_quantity").alias("q"))
    )
    sp = li97.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("q").cast("decimal(20,2)").alias("qty_sp")
    )
    per_part = li97.groupBy(F.col("l_partkey").alias("pp_pk")).agg(
        F.sum("q").cast("decimal(20,2)").alias("qty_p")
    )
    qual = (
        sp.join(per_part, sp.l_partkey == F.col("pp_pk"))
        .filter(
            F.col("qty_sp") * F.lit(2).cast("decimal(2,0)") > F.col("qty_p")
        )
        .select("l_suppkey")
        .distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    asia = (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_name")
    )
    return (
        asia.join(qual, asia.s_suppkey == qual.l_suppkey, "semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


Q20_ORACLE = """
WITH li97 AS (
  SELECT l_suppkey, l_partkey, CAST(l_quantity AS DECIMAL(12,2)) AS q
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE '%red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
),
sp AS (
  SELECT l_suppkey, l_partkey, CAST(SUM(q) AS DECIMAL(20,2)) AS qty_sp
  FROM li97 GROUP BY 1, 2
)
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey FROM sp s1
    WHERE qty_sp * CAST(2 AS DECIMAL(2,0)) >
          (SELECT CAST(SUM(q) AS DECIMAL(20,2)) FROM li97 l2
           WHERE l2.l_partkey = s1.l_partkey)
  )
ORDER BY s_name
"""


def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): late lines
    (shipped >60 days after order date) in finalized multi-supplier orders
    where no OTHER supplier was late — the EXISTS / NOT EXISTS double
    correlation decorrelated into one per-order aggregate pass (distinct
    suppliers, distinct late suppliers, late-line count) with zero
    self-joins; counts late LINES per supplier like the rowwise original."""
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load(spark, sf_dir, "lineitem")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late_lines"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(supp, per_order.late_supp == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_lines").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
    )


Q21_ORACLE = """
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q11_important_value": q11_important_value,
    "q16_supplier_relationship": q16_supplier_relationship,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_waiting_suppliers": q21_waiting_suppliers,
    "q6_forecast_revenue": q6_forecast_revenue,
    "zorder_layout_orders": zorder_layout_orders,
    "pareto_parts": pareto_parts,
    "q4_order_priority": q4_order_priority,
    "rollup_grouping_orders": rollup_grouping_orders,
    "q12_shipmode_priority": q12_shipmode_priority,
    "q14_promo_revenue": q14_promo_revenue,
    "q10_returned_items": q10_returned_items,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q13_customer_distribution": q13_customer_distribution,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q7_volume_shipping": q7_volume_shipping,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "q9_product_type_profit": q9_product_type_profit,
    "q15_top_supplier": q15_top_supplier,
    "q8_market_share": q8_market_share,
    "ship_lag_orders": ship_lag_orders,
    "profile_orders": profile_orders,
    "weighted_median_lineitem": weighted_median_lineitem,
    "target_encode_orders": target_encode_orders,
    "q1_pricing_summary": q1_pricing_summary,
    "validate_orders": validate_orders,
    "unpivot_orders_by_priority": unpivot_orders_by_priority,
    "percent_rank_orders": percent_rank_orders,
    "rfm_segments_customers": rfm_segments_customers,
    "latest_order_per_customer": latest_order_per_customer,
    "calendar_stats_orders": calendar_stats_orders,
    "cube_stats_orders": cube_stats_orders,
    "pivot_orders_by_priority": pivot_orders_by_priority,
    "bloom_filter_orders": bloom_filter_orders,
    "decile_stats_orders": decile_stats_orders,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "filter_tree_orders": filter_tree_orders,
    "scalar_text_functions": scalar_text_functions,
    "content_ids": content_ids,
    "topn_orders_per_customer": topn_orders_per_customer,
    "rollup_customer_orders": rollup_customer_orders,
    "anti_join_orders_without_lineitems": anti_join_orders_without_lineitems,
    "semi_join_urgent_customers": semi_join_urgent_customers,
    "table_stats": table_stats,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_ORACLE,
    "q11_important_value": Q11_ORACLE,
    "q16_supplier_relationship": Q16_ORACLE,
    "q20_potential_promotion": Q20_ORACLE,
    "q21_waiting_suppliers": Q21_ORACLE,
    "q6_forecast_revenue": Q6_ORACLE,
    "zorder_layout_orders": ZORDER_ORACLE,
    "pareto_parts": PARETO_ORACLE,
    "q4_order_priority": Q4_ORACLE,
    "rollup_grouping_orders": ROLLUP_GROUPING_ORACLE,
    "q12_shipmode_priority": Q12_ORACLE,
    "q14_promo_revenue": Q14_ORACLE,
    "q10_returned_items": Q10_ORACLE,
    "q19_discounted_revenue": Q19_ORACLE,
    "q13_customer_distribution": Q13_ORACLE,
    "q17_small_quantity_revenue": Q17_ORACLE,
    "q18_large_volume_customers": Q18_ORACLE,
    "q7_volume_shipping": Q7_ORACLE,
    "q22_global_sales_opportunity": Q22_ORACLE,
    "q9_product_type_profit": Q9_ORACLE,
    "q15_top_supplier": Q15_ORACLE,
    "q8_market_share": Q8_ORACLE,
    "ship_lag_orders": SHIP_LAG_ORACLE,
    "profile_orders": PROFILE_ORACLE,
    "weighted_median_lineitem": WEIGHTED_MEDIAN_ORACLE,
    "target_encode_orders": TARGET_ENCODE_ORACLE,
    "q1_pricing_summary": Q1_ORACLE,
    "cube_stats_orders": CUBE_ORACLE,
    "pivot_orders_by_priority": PIVOT_ORACLE,
    "bloom_filter_orders": BLOOM_ORACLE,
    "decile_stats_orders": DECILE_ORACLE,
    "validate_orders": VALIDATE_ORACLE,
    "unpivot_orders_by_priority": UNPIVOT_ORACLE,
    "percent_rank_orders": PERCENT_RANK_ORACLE,
    "rfm_segments_customers": RFM_ORACLE,
    "latest_order_per_customer": ARG_MAX_ORACLE,
    "calendar_stats_orders": CALENDAR_ORACLE,
    "q3_shipping_priority": Q3_ORACLE,
    "q5_local_supplier_volume": Q5_ORACLE,
    "filter_tree_orders": FILTER_TREE_ORACLE,
    "scalar_text_functions": SCALAR_TEXT_ORACLE,
    "content_ids": CONTENT_IDS_ORACLE,
    "topn_orders_per_customer": TOPN_ORACLE,
    "rollup_customer_orders": ROLLUP_ORACLE,
    "anti_join_orders_without_lineitems": ANTI_JOIN_ORACLE,
    "semi_join_urgent_customers": SEMI_JOIN_ORACLE,
    "table_stats": TABLE_STATS_ORACLE,
}
