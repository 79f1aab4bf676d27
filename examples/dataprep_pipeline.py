"""Training-data pipeline end-to-end: what a data engineer writes to turn a
raw document corpus into deduplicated, decontaminated, sharded training
data with quality audits — every stage one of this engine's operators.

    python examples/dataprep_pipeline.py

Stages (each also oracle-gated as a workload query — see COVERAGE.md):
1. Quality gates: Gopher-style rule gate + heuristic score.
2. Dedup: exact (hash) → MinHash-LSH near-dup clusters, keep-best.
3. Decontamination: drop docs colliding with an eval set's n-grams.
4. Split + shard: leakage-stable train/val/test, salted shuffle shards.
5. Audits: token counts, KL / KS drift between halves, dup-span coverage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graphrag_toolkit_spark.operators import dedup, sampling, textstats  # noqa: E402
from graphrag_toolkit_spark.operators.decontam import contamination  # noqa: E402
from graphrag_toolkit_spark.session import build_session, load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = build_session("dataprep-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gates ------------------------------------------------------
    gated = textstats.gopher_gate(docs, "text", "doc_id")
    keep_ids = gated.filter(F.col("passes")).select(F.col("id").alias("doc_id"))
    docs = docs.join(keep_ids, "doc_id", "left_semi")
    n1 = docs.count()
    print(f"1. gopher gate: {n0} -> {n1} docs")

    # 2. dedup: exact, then near-dup clusters keep best-quality member ------
    docs = dedup.exact_dedup(docs, "text", "doc_id")
    n2 = docs.count()
    pairs = dedup.minhash_near_dup_pairs(docs, "text", "doc_id", k=2, threshold=0.5)
    clusters = dedup.connected_components(pairs)
    drop = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    n3 = docs.count()
    print(f"2. dedup: exact {n2}, near-dup survivors {n3}")

    # 3. decontamination vs a (here: synthetic) eval set --------------------
    eval_set = load(spark, SF_DIR, "documents").orderBy("doc_id").limit(5).select(
        "doc_id", "text"
    )
    contaminated = contamination(docs, eval_set, "text", "doc_id", n=4).select(
        F.col("id").alias("doc_id")
    )
    clean = docs.join(contaminated, "doc_id", "left_anti")
    n4 = clean.count()
    print(f"3. decontaminated: {n3} -> {n4}")

    # 4. split + shard ------------------------------------------------------
    split = sampling.train_val_test_split(clean, "doc_id")
    shards = sampling.shard_corpus(
        split.filter(F.col("split") == "train"), "doc_id", n_shards=4
    )
    dist = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    print(f"4. splits: {dist}; train shards: "
          f"{shards.select('shard').distinct().count()}")

    # 5. audits -------------------------------------------------------------
    toks = textstats.token_stats(clean, "text", "doc_id").agg(
        F.sum("word_tokens").alias("total_words")
    ).head()
    print(f"5. audit: {toks['total_words']} training words; "
          f"entropy/drift/dup-span audits available as workload queries")

    # 6. round-5 curation: DSIR target-likeness + two-way mixture raking ---
    docs = load(spark, SF_DIR, "documents")
    target = docs.filter(F.col("source") == "src0")  # 'curated' slice
    dsir = sampling.dsir_log_weights(docs, target, "text", "doc_id")
    top = dsir.orderBy(F.desc("dsir_logw"), F.asc("id")).limit(3).collect()
    print("6. DSIR: most target-like docs:",
          [(r["id"], round(r["dsir_logw"], 2)) for r in top])
    rake = sampling.ipf_rake(docs, "lang", "source")
    ext = rake.orderBy(F.desc("weight")).limit(2).collect()
    print("   raking: most up-weighted (lang, source) cells:",
          [(r["lang"], r["source"], round(r["weight"], 3)) for r in ext])

    # 7. tokenizer training over the cleaned corpus -------------------------
    from graphrag_toolkit_spark.operators.packing import bpe_train_merges

    merges = bpe_train_merges(clean, "text", rounds=3).collect()
    print("7. BPE merges learned:",
          [(r["sym_a"], r["sym_b"], r["n"]) for r in merges])

    # 8. the same pipeline through the fluent façade ------------------------
    from graphrag_toolkit_spark.api import CorpusPipeline

    report = (
        CorpusPipeline()
        .with_quality_gate()
        .with_exact_dedup()
        .with_decontamination(eval_set, n=4)
        .with_dsir_selection(target, keep_fraction=0.8)
        .with_split()
        .report(load(spark, SF_DIR, "documents"))
    )
    print("8. CorpusPipeline report:",
          " -> ".join(f"{r['stage']}={r['rows']}" for r in report))

    spark.stop()


if __name__ == "__main__":
    main()
