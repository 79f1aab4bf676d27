"""Classifier-audit + lakehouse-maintenance walkthrough: how a data team
audits a corpus quality filter and plans table maintenance — every stage one
of this engine's oracle-gated operators.

    python examples/eval_audit.py

Stages (each also a workload query — see COVERAGE.md):
1. Discrimination: exact ROC-AUC, then PER-SLICE AUC (fairness cut).
2. Operating point: thresholded precision/recall/F1 report.
3. Probability quality: reliability bins (ECE/Brier numerators).
4. Rater agreement: Cohen's kappa between two gates.
5. Maintenance: Z-order layout envelopes + compaction plan.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphrag_toolkit_spark.operators.packing import zorder_layout  # noqa: E402
from graphrag_toolkit_spark.operators.ranking_eval import (  # noqa: E402
    binary_auc,
    calibration_bins,
    classification_report,
    cohen_kappa,
    grouped_auc,
)
from graphrag_toolkit_spark.session import build_session, load  # noqa: E402
from graphrag_toolkit_spark.sources.sink import compaction_plan  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = build_session("eval-audit-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, SF_DIR, "documents")

    # the toy classifier under audit: document length predicting English
    scored = docs.select(
        "source",
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").alias("label"),
    )

    # 1. discrimination ------------------------------------------------------
    overall = binary_auc(scored, "score", "label").head()
    print(f"1. AUC overall: {overall['auc']:.4f} "
          f"(pos={overall['n_pos']}, neg={overall['n_neg']})")
    worst = (
        grouped_auc(scored, "source", "score", "label")
        .orderBy(F.asc_nulls_last("auc"))
        .head()
    )
    print(f"   weakest slice: source={worst['source']} auc={worst['auc']:.4f}")

    # 2. operating point -----------------------------------------------------
    rep = classification_report(scored, "score", "label", threshold=300.0).head()
    print(f"2. @300 chars: precision={rep['precision']:.3f} "
          f"recall={rep['recall']:.3f} f1={rep['f1']:.3f}")

    # 3. probability quality -------------------------------------------------
    mx = docs.agg(F.max("n_chars").alias("mx"))
    conf = docs.crossJoin(F.broadcast(mx)).select(
        F.expr("(n_chars * 1000000) div mx").cast("long").alias("conf6"),
        (F.col("lang") == "en").alias("label"),
    )
    bins = calibration_bins(conf, "conf6", "label").orderBy("bin").collect()
    n_total = sum(b["n"] for b in bins)
    ece = sum(b["gap6"] for b in bins) / (n_total * 1e6)
    brier = sum(b["sq_err12"] for b in bins) / (n_total * 1e12)
    print(f"3. calibration: ECE={ece:.4f} Brier={brier:.4f} over {len(bins)} bins")

    # 4. rater agreement -----------------------------------------------------
    raters = docs.select(
        (F.col("n_chars") >= 300).alias("len_gate"),
        (F.col("lang") == "en").alias("lang_gate"),
    )
    k = cohen_kappa(raters, "len_gate", "lang_gate").head()
    print(f"4. kappa(len_gate, lang_gate) = {k['kappa']:.4f} (p_o={k['p_o']:.3f})")

    # 5. maintenance ---------------------------------------------------------
    orders = load(spark, SF_DIR, "orders").select(
        F.col("o_custkey").cast("long").alias("ck"),
        F.datediff("o_orderdate", F.lit("1995-01-01")).cast("long").alias("day"),
        "o_orderkey",
    )
    files = zorder_layout(orders, "ck", "day", "o_orderkey", rows_per_file=256)
    spans = files.select(
        F.avg(F.col("max_x") - F.col("min_x")).alias("x_span"),
        F.avg(F.col("max_y") - F.col("min_y")).alias("y_span"),
        F.count(F.lit(1)).alias("n_files"),
    ).head()
    print(f"5. zorder: {spans['n_files']} files, avg envelope "
          f"x={spans['x_span']:.0f} days={spans['y_span']:.0f}")
    manifest = (
        load(spark, SF_DIR, "events")
        .select("event_type",
                F.expr("unix_micros(ts) div 86400000000").alias("day"),
                F.length("props").alias("b"))
        .groupBy("event_type", "day")
        .agg(F.sum("b").cast("long").alias("size_bytes"))
    )
    plan = compaction_plan(manifest, "day", "size_bytes", 3000,
                           partition_cols=["event_type"])
    nb = plan.select("event_type", "bin").distinct().count()
    nf = plan.count()
    print(f"   compaction: {nf} files -> {nb} rewrite tasks")

    spark.stop()


if __name__ == "__main__":
    main()
