"""Corpus snapshot diff: what changed between two versions of a table.

North-star lifecycle extension alongside SCD-2 versioning
(`sources/sink.py`): pipelines re-crawl, re-clean, and re-ingest, and the
first audit question is "what did this pass actually change?". The diff is
one content-hash full-outer join — added / removed / changed / unchanged
per id, no text shuffled (hashes computed at the scans, corpus text pruned
away before the join).

Scale shape: two narrow projections (id, md5) + one id-equi full outer
join; co-partitionable, AQE handles skew, and the output is one row per
id. The same operator diffs yesterday's snapshot against today's at any
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    new_text_col: str | None = None,
) -> DataFrame:
    """(id, status, old_hash, new_hash) with status ∈ added | removed |
    changed | unchanged. ``added`` = only in ``new``; ``removed`` = only in
    ``old``; hashes are md5 of the compared column (``new_text_col``
    defaults to ``text_col`` — set it when the cleaning pass renames, e.g.
    ``text_scrubbed``)."""
    a = old.select(
        F.col(id_col).alias("id"), F.md5(F.col(text_col)).alias("old_hash")
    )
    b = new.select(
        F.col(id_col).alias("id"),
        F.md5(F.col(new_text_col or text_col)).alias("new_hash"),
    )
    return a.join(b, "id", "full_outer").select(
        "id",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
        "old_hash",
        "new_hash",
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """(status, n) rollup of a `corpus_diff` result."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n"))
