"""Event-time windowing workload over the driver's ``events`` table
(SURVEY §2.9 — engine extensions: the reference has no streaming engine; these
are the batch equivalents of the Structured Streaming operators in
``streaming/``, oracle-checked here so the window semantics are pinned).

Money-style sums are aggregated in DECIMAL (events.value is 2-decimal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.session import load


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(12,2)")


def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact value sum."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


TUMBLING_ORACLE = """
SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start, event_type,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total
FROM events
GROUP BY window_start, event_type
"""


def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event lands in 2)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


SLIDING_ORACLE = """
WITH starts AS (
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS window_start FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE FROM events
)
SELECT window_start, COUNT(*) AS n FROM starts GROUP BY window_start
"""


SESSION_GAP_MINUTES = 30


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: per user, a >30-min silence starts a new
    session; emit per-session stats. The lag+cumsum pattern is the classic
    batch equivalent of streaming ``session_window`` (same session bounds)."""
    ev = load(spark, sf_dir, "events")
    by_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(by_user)
    with_s = (
        ev.withColumn("new_session", F.when(gap.isNull() | (gap > SESSION_GAP_MINUTES * 60), 1).otherwise(0))
        .withColumn("session_idx", F.sum("new_session").over(
            by_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    )
    return (
        with_s.groupBy("user_id", "session_idx")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("total_value"),
        )
    )


SESSIONIZE_ORACLE = f"""
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {SESSION_GAP_MINUTES * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM g
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(12,2))), 2) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_idx
"""


def event_type_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered event-type journey (first 10 events), as a string —
    the ordered-collect discipline check on real event data."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .groupBy("user_id")
        .agg(
            F.concat_ws(
                ">",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("rn"), F.col("event_type")))
                    ),
                    lambda x: x["event_type"],
                ),
            ).alias("journey")
        )
    )


FUNNEL_ORACLE = """
WITH r AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS journey
FROM r WHERE rn <= 10 GROUP BY user_id
"""


QUERIES = {
    "tumbling_window_events": tumbling_window_events,
    "sliding_window_events": sliding_window_events,
    "sessionize_events": sessionize_events,
    "event_type_funnel": event_type_funnel,
}

ORACLES = {
    "tumbling_window_events": TUMBLING_ORACLE,
    "sliding_window_events": SLIDING_ORACLE,
    "sessionize_events": SESSIONIZE_ORACLE,
    "event_type_funnel": FUNNEL_ORACLE,
}
