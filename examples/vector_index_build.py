"""Vector-index build walkthrough: what an ML-infra engineer runs to turn a
raw embedding table into a quality-gated, compressed, sharded index with
measured ANN quality — every stage one of this engine's oracle-gated
operators.

    python examples/vector_index_build.py [sf_dir]

Stages (each also a workload query — see COVERAGE.md):
1. Outlier gate: drop the vectors farthest from the corpus centroid
   (exact-decimal distances — corrupt/degenerate embeddings).
2. Compression: SQ8 int8 quantization (one narrow map stage).
3. Sharding: sign-LSH buckets + the per-shard build manifest.
4. Quality loops: IVF recall@k vs brute force, LSH bucket label purity.
5. Eval hygiene: embedding-space decontamination across a content-hash
   train/test split (catches paraphrase-shaped leakage).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphrag_toolkit_spark.session import build_session  # noqa: E402
from graphrag_toolkit_spark.workload.dataprep import (  # noqa: E402
    ann_ivf_recall,
    lsh_bucket_purity_embeddings,
    semantic_decontaminate_embeddings,
    vector_index_pipeline,
)
from graphrag_toolkit_spark.workload.vector import embedding_outliers  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_session("vector-index-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. outlier gate (top-5 farthest from centroid) ==")
    embedding_outliers(spark, sf_dir).show(5, truncate=False)

    print("== 2+3. index build manifest (outlier drop -> SQ8 -> LSH shards) ==")
    vector_index_pipeline(spark, sf_dir).show(8, truncate=False)

    print("== 4a. IVF recall@5 vs brute force ==")
    ann_ivf_recall(spark, sf_dir).show(truncate=False)

    print("== 4b. LSH shard label purity (router diagnostic) ==")
    lsh_bucket_purity_embeddings(spark, sf_dir).show(5, truncate=False)

    print("== 5. embedding-space decontamination (test vs train) ==")
    semantic_decontaminate_embeddings(spark, sf_dir).show(5, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
