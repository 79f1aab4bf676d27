"""SparkSession factory tuned for this engine.

Scale notes (100 TB target): these configs encode the *local* test shape; on a
real cluster the same settings apply with shuffle partitions sized to
``max(2 * total_cores, input_bytes / 128MB)`` and AQE coalescing down from
there. Everything else (pushdown, broadcast selection, skew handling) is left
to Catalyst/AQE on purpose — we express plans declaratively and do not
hand-schedule.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def build_session(
    app_name: str = "graphrag_toolkit_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build a SparkSession with the engine's defaults.

    - AQE on (runtime coalesce / skew-join / broadcast demotion).
    - Arrow on (all pandas_udf / mapInPandas stages are Arrow-batched).
    - Session timezone pinned to UTC so timestamps compare exactly against
      the DuckDB oracle (DuckDB timestamps are UTC-naive).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet stores TIMESTAMP(NANOS), which Spark refuses by
        # default; read as long and convert in load() (DuckDB truncates
        # nanos→micros on read — integer division matches it exactly).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def register_testdata(spark: SparkSession, sf_dir: str) -> None:
    """Register the driver's parquet fixtures as temp views named like the
    DuckDB oracle's views (TESTDATA.md)."""
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)


def load(spark: SparkSession, sf_dir: str, name: str):
    """Load one driver fixture table as a DataFrame.

    Works on ANY SparkSession, not just ones from build_session(), and on
    either events encoding the driver has shipped: TIMESTAMP(NANOS) (which
    Spark rejects unless spark.sql.legacy.parquet.nanosAsLong is set — that
    conf is runtime-settable, so set it here before the read) or plain
    TIMESTAMP(MICROS). Either way the column comes out as a microsecond
    timestamp, matching how DuckDB reads the same file.
    """
    from pyspark.sql import functions as F

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos-as-long → timestamp at microsecond precision (trunc, like DuckDB)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # NTZ→TZ cast interprets the wall-clock in the SESSION timezone,
            # so it is value-preserving (a pure relabel) only under UTC.
            # build_session pins UTC; a foreign session must too, or the
            # instant silently shifts relative to the nanos-as-long path and
            # the DuckDB oracle (which reads the file UTC-naive).
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz != "UTC":
                raise ValueError(
                    "load('events') requires spark.sql.session.timeZone='UTC' "
                    f"(got {tz!r}): the TIMESTAMP_NTZ→TIMESTAMP relabel is "
                    "only value-preserving under UTC. Use build_session() or "
                    "set the conf before loading."
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df
