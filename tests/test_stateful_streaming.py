"""Cross-batch stateful streaming operators (applyInPandasWithState):
first-seen dedup and running counters, checked against batch equivalents."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from graphrag_toolkit_spark.streaming import stateful
from graphrag_toolkit_spark.streaming.ingest import read_jsonl_stream

SCHEMA = "id long, text_hash string, event_type string, value double"

# batch 1: ids 0-3; batch 2: ids 10-13 — every duplicate hash in batch 2 has
# a HIGHER id, so streaming first-seen == batch global min
BATCH1 = [
    {"id": 0, "text_hash": "h_a", "event_type": "click", "value": 1.5},
    {"id": 1, "text_hash": "h_b", "event_type": "click", "value": 2.0},
    {"id": 2, "text_hash": "h_a", "event_type": "view", "value": 0.5},
    {"id": 3, "text_hash": "h_c", "event_type": "view", "value": 1.0},
]
BATCH2 = [
    {"id": 10, "text_hash": "h_a", "event_type": "click", "value": 4.0},  # dup
    {"id": 11, "text_hash": "h_d", "event_type": "view", "value": 3.0},   # new
    {"id": 12, "text_hash": "h_b", "event_type": "click", "value": 1.0},  # dup
]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    for i, batch in enumerate([BATCH1, BATCH2]):
        p = d / f"batch{i}.jsonl"
        p.write_text("\n".join(json.dumps(r) for r in batch))
        # distinct mtimes pin micro-batch order (oldest first)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    return str(d)


def _run(stream_df, name, mode):
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


class TestDedupStream:
    def test_first_seen_only_across_batches(self, spark, stream_dir):
        src = read_jsonl_stream(spark, stream_dir, SCHEMA, max_files_per_trigger=1)
        _run(stateful.dedup_stream(src), "dedup_out", "append")
        got = {
            r["text_hash"]: r["first_id"]
            for r in spark.sql("SELECT * FROM dedup_out").collect()
        }
        # one row per distinct hash, surviving id = first-seen (== global min here)
        batch = stateful.batch_dedup_reference(
            spark.createDataFrame(BATCH1 + BATCH2, SCHEMA)
        )
        want = {r["text_hash"]: r["first_id"] for r in batch.collect()}
        assert got == want
        assert got["h_a"] == 0 and got["h_d"] == 11


class TestRunningCounts:
    def test_counters_accumulate_across_batches(self, spark, stream_dir):
        src = read_jsonl_stream(spark, stream_dir, SCHEMA, max_files_per_trigger=1)
        _run(stateful.running_counts_stream(src), "counts_out", "update")
        rows = spark.sql("SELECT * FROM counts_out").collect()
        # update mode: keep the LAST emission per key
        last = {}
        for r in rows:
            last[r["event_type"]] = (r["n"], r["total"])
        assert last["click"] == (4, pytest.approx(8.5))
        assert last["view"] == (3, pytest.approx(4.5))
