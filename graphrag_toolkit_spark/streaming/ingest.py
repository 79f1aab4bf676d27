"""Structured Streaming ingestion + event-time operators (SURVEY §2.9).

The reference's only 'streaming' is incremental JSONL reading with
checkpoint-resume (``streaming_jsonl_reader_provider.py``, S6); its Spark
mapping is the real thing: ``readStream`` with ``maxFilesPerTrigger``,
watermarked event-time windows, and ``foreachBatch`` into the build pipeline,
with exactly-once bookkeeping from Spark's own offsets + the content-id MERGE
semantics of the sink (idempotent re-deliveries).

Batch/stream parity: every aggregation here mirrors a batch query in
``workload/events.py`` whose DuckDB oracle pins the window semantics; tests
assert stream output == batch output on the same rows (the strongest check
available without a second streaming engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl_stream(
    spark: SparkSession, path: str, schema: StructType | str,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """S1-streaming: incremental JSONL ingestion. New files are discovered per
    micro-batch; offsets live in the query checkpoint — the reference's
    byte-offset bookkeeping is the source's own contract here."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def windowed_counts(
    events: DataFrame, ts_col: str = "ts", key_col: str = "event_type",
    window: str = "1 hour", watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts + exact decimal value sums. Late
    rows beyond the watermark are dropped; within it, windows update in
    place (update/append per output mode)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), key_col, "n", "total")
    )


def session_windows(
    events: DataFrame, ts_col: str = "ts", key_col: str = "user_id",
    gap: str = "30 minutes", watermark: str = "2 hours",
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` closes a session
    after ``gap`` of silence per key (same bounds as the batch lag+cumsum
    sessionizer in workload/events.py)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a (bounded) streaming query to completion synchronously into an
    in-memory table — the local test harness; production uses foreachBatch
    into the parquet MERGE sink."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def stream_to_merge_sink(
    agg: DataFrame, checkpoint_dir: str, write_fn,
) -> None:
    """foreachBatch into an idempotent sink: ``write_fn(df, epoch_id)`` is a
    batch function (e.g. sink.append_merge partial). Content-addressed ids +
    MERGE semantics make redelivered batches no-ops — exactly-once effect on
    at-least-once delivery."""
    q = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_fn)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def enrich_stream(
    stream: DataFrame, dim: DataFrame, on: str, how: str = "left"
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    static dimension (Structured Streaming re-plans the static side per
    batch, so a dimension refreshed in place is picked up on the next
    trigger). Small dims broadcast — the stream side never shuffles; the
    standard feature-lookup shape for event enrichment at any scale."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str = "ts",
    max_lag: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (the conversion-attribution
    shape: a right event joins every left event by the same key in the
    preceding ``max_lag``): both sides carry event-time watermarks so the
    engine can bound its join state — a left row is dropped from state
    once the right watermark passes ``its ts + max_lag``, keeping state
    O(events inside the lag window), not O(stream). Inner join (Structured
    Streaming's fully-supported stream-stream mode); the time-range
    predicate is the state-cleanup contract, so both the lag bound AND the
    watermark are required.

    Returns (key, l_ts, r_ts, lag_us) — project further downstream.
    Batch twin for tests: the same interval predicate as a static
    self-join (`temporal.touch_attribution` is the windowed batch analog)."""
    l = (
        left.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("k"),
            F.col(ts_col).alias("l_ts"),
        )
    )
    r = (
        right.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("rk"),
            F.col(ts_col).alias("r_ts"),
        )
    )
    return l.join(
        r,
        F.expr(
            f"k = rk AND l_ts <= r_ts AND r_ts <= l_ts + interval {max_lag}"
        ),
    ).select(
        F.col("k").alias(key),
        "l_ts",
        "r_ts",
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts")))
        .alias("lag_us"),
    )


def maintain_join_view_stream(
    changes_stream: DataFrame,
    spark_view: dict,
    dim: DataFrame,
    key_col: str,
    dim_key: str,
    seq_col: str = "seq",
    op_col: str = "op",
):
    """STREAMING materialized-view maintenance: a changelog stream keeps a
    fact ⋈ dimension view current via ``foreachBatch`` + the delta-join
    rule (`sink.maintain_join`) — the Structured-Streaming face of the
    same refresh path (CDC topic in, always-fresh denormalized view out).

    ``spark_view`` is a one-key dict ``{"df": <current view DataFrame>}``
    acting as the view handle: each micro-batch replaces it with the
    maintained result (localCheckpointed so lineage doesn't accumulate
    across batches). Production swaps the handle for a Delta/parquet
    MERGE target; the per-batch algebra — only Δ joins the dimension — is
    identical, which is what the stream==batch test pins.

    Per-batch cost: O(|view| anti-join + |Δbatch| ⋈ dim). Cross-batch
    semantics: the last BATCH containing a key wins (within a batch,
    highest seq) — identical to replaying the full changelog iff sequence
    numbers are monotone with batch order, which CDC offsets/LSNs are;
    an out-of-order replay (old seq arriving in a later batch) would need
    a seq column persisted in the view to fence, as Delta CDC appliers
    do."""
    from graphrag_toolkit_spark.sources.sink import maintain_join

    def _apply(batch_df: DataFrame, _epoch: int) -> None:
        if batch_df.isEmpty():
            return
        spark_view["df"] = maintain_join(
            spark_view["df"], batch_df, key_col, dim, dim_key,
            seq_col=seq_col, op_col=op_col,
        ).localCheckpoint(eager=True)

    return (
        changes_stream.writeStream.outputMode("append")
        .foreachBatch(_apply)
        .start()
    )
