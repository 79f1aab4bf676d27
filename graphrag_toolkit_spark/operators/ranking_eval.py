"""Ranking-quality evaluation: NDCG@k, MRR, recall@k over result lists.

North-star evaluation harness for the retrieval stack (the reference
evaluates ANSWERS with an LLM grader — `benchmark-tests/run_evaluation.py`
— but publishes no ranking-metric layer; at engine level the standard IR
metrics are what you tune retrievers against, and they distribute
trivially: everything is one join of results to judgments + per-query
aggregates).

Exactness: DCG divides by log2(1+rank) — a transcendental — so each
discount is quantized to the decimal grid (`round(ln(1+rank)/ln2-literal,
6)`; same rationale as `textstats.word_entropy`) and gains are integer
relevance grades; per-query sums are exact decimals divided on exact
operands, so all three metrics hash-match across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.operators.textstats import LN2


def _discount(rank: Column) -> Column:
    """1 / log2(1 + rank), quantized: decimal(12,6) grid."""
    l2 = F.round(F.log(F.lit(1.0) + rank.cast("double")) / F.lit(LN2), 6)
    return F.round(F.lit(1.0) / l2, 6).cast("decimal(12,6)")


def ranking_metrics(
    results: DataFrame,       # (query_id, doc_id, rank)  rank 1-based
    judgments: DataFrame,     # (query_id, doc_id, rel)   integer grades
    k: int = 10,
) -> DataFrame:
    """Per-query metrics at cutoff k:
    (query_id, dcg, idcg, ndcg, mrr, n_relevant, n_retrieved_relevant,
    recall) — ideal DCG ranks the query's judged-relevant docs by grade
    desc (doc_id asc tie-break)."""
    r = results.filter(F.col("rank") <= k).join(
        judgments, ["query_id", "doc_id"], "left"
    ).withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))

    per_q = r.groupBy("query_id").agg(
        F.sum(
            (F.col("rel") * _discount(F.col("rank"))).cast("decimal(18,6)")
        ).cast("double").alias("dcg"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("_first_rel"),
        F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias(
            "n_retrieved_relevant"
        ),
    )

    iw = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        judgments.filter(F.col("rel") > 0)
        .withColumn("irank", F.row_number().over(iw))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("irank") <= k,
                    (F.col("rel") * _discount(F.col("irank"))).cast(
                        "decimal(18,6)"
                    ),
                ).otherwise(F.lit(0).cast("decimal(18,6)"))
            ).cast("double").alias("idcg"),
            F.count(F.lit(1)).alias("n_relevant"),
        )
    )

    # Full outer: a query with judgments but nothing retrieved within top-k
    # must still appear (all-zero metrics) — dropping it would silently
    # inflate any macro-average taken over this table.
    return (
        per_q.join(ideal, "query_id", "full")
        .select(
            "query_id",
            F.coalesce(F.col("dcg"), F.lit(0.0)).alias("dcg"),
            F.coalesce(F.col("idcg"), F.lit(0.0)).alias("idcg"),
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            ).otherwise(F.lit(0.0)).alias("ndcg"),
            F.when(
                F.col("_first_rel").isNotNull(),
                F.lit(1.0) / F.col("_first_rel").cast("double"),
            ).otherwise(F.lit(0.0)).alias("mrr"),
            F.coalesce(F.col("n_relevant"), F.lit(0)).alias("n_relevant"),
            F.coalesce(F.col("n_retrieved_relevant"), F.lit(0)).alias(
                "n_retrieved_relevant"
            ),
            F.when(
                F.coalesce(F.col("n_relevant"), F.lit(0)) > 0,
                F.coalesce(F.col("n_retrieved_relevant"), F.lit(0)).cast("double")
                / F.col("n_relevant"),
            ).otherwise(F.lit(0.0)).alias("recall"),
        )
    )


def binary_auc(
    scored: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Exact ROC-AUC via the Mann-Whitney rank statistic, tie-corrected
    with average ranks — and computed ENTIRELY in integers until the one
    final division, so the value is engine-identical (no float rank sums):

        group rows by distinct score (ascending); for a group with count c
        whose first ascending rank is r, the average rank is r + (c−1)/2,
        i.e. DOUBLED avg rank = 2r + c − 1 (an integer).
        S2 = Σ over positives of doubled avg rank
        AUC = (S2 − P(P+1)) / (2·P·N)

    One groupBy on the score + one cumulative window over the (distinct-
    score-sized) group table. Returns (n_pos, n_neg, auc); auc is NULL
    when either class is empty (undefined).

    NULL handling (pinned, not engine-default): rows with a NULL score are
    EXCLUDED up front — a NULL score has no rank, and Spark (NULLS FIRST)
    and ANSI SQL (NULLS LAST) would otherwise silently disagree on where
    its group sits in the cumulative window. Rows with a NULL label count
    as negatives (``cast("boolean")`` of NULL is NULL → ``otherwise(0)``)."""
    scored = scored.filter(F.col(score_col).isNotNull())
    g = (
        scored.groupBy(F.col(score_col).alias("__s"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)
            ).alias("pos"),
        )
    )
    w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, 0)
    g = g.withColumn("cum", F.sum("c").over(w))
    # first ascending rank of the group r = cum - c + 1; doubled avg rank:
    s2_term = F.col("pos") * (2 * (F.col("cum") - F.col("c") + 1) + F.col("c") - 1)
    agg = g.agg(
        F.sum(s2_term).cast("bigint").alias("s2"),
        F.sum("pos").cast("bigint").alias("p"),
        F.sum("c").cast("bigint").alias("n_total"),
    )
    n_neg = F.col("n_total") - F.col("p")
    return agg.select(
        F.col("p").alias("n_pos"),
        n_neg.alias("n_neg"),
        F.when(
            (F.col("p") > 0) & (n_neg > 0),
            (F.col("s2") - F.col("p") * (F.col("p") + 1)).cast("double")
            / (2 * F.col("p") * n_neg).cast("double"),
        ).alias("auc"),
    )
