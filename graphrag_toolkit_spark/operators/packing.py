"""Training-sequence packing (north-star extras): the GPT-style
concatenate-and-chop step that turns a deduped, filtered corpus into
fixed-length training sequences (public recipe: concatenate documents in a
fixed order, split every ``seq_len`` tokens; documents may span
boundaries).

Deterministic and engine-portable the same way ``sampling.py`` is: the
concatenation order is (bucket, content-hash, id) — a pure function of the
ids — so the packing layout survives re-partitioning, re-ingestion, and
engine migration, and the DuckDB oracle reproduces it with the identical
window sum.

100 TB shape: packing is a running sum, which is inherently sequential —
so it is sharded. Documents are split into ``n_buckets`` independent
hash-streams and each stream packs itself (one window partition = one
task). With buckets ≫ executors the stage is embarrassingly parallel and
no single task sees more than corpus/n_buckets rows; the price is that
sequence ids are per-bucket (emitted as a (bucket, seq_in_bucket) pair),
which training loaders accept — shards are how every real pipeline packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.operators.sampling import hash_value


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int = 512,
    n_buckets: int = 8,
) -> DataFrame:
    """Assign every document its position in the packed token stream:
    (id, bucket, seq_in_bucket — the sequence containing the doc's first
    token, offset — the doc's start position within that sequence).
    Pure integer arithmetic over one partitioned running sum."""
    h = hash_value(F.col(id_col))
    w = (
        Window.partitionBy("bucket")
        .orderBy(F.asc("_h"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    withcum = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(tokens_col).alias("_t"),
            h.alias("_h"),
        )
        .withColumn("bucket", (F.col("_h") % F.lit(n_buckets)).cast("int"))
        .withColumn("_cum", F.sum("_t").over(w))
    )
    start = F.col("_cum") - F.col("_t")
    offset = start % F.lit(seq_len)
    # (start - offset) / seq_len: numerator exactly divisible, so the double
    # division is exact for any corpus < 2^53 tokens — integer-div semantics
    # without leaving the long domain in either engine
    return withcum.select(
        "id",
        "bucket",
        ((start - offset) / F.lit(seq_len)).cast("long").alias("seq_in_bucket"),
        offset.cast("int").alias("offset"),
    )
