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

    # ideal DCG only needs each query's top-k judged docs; expressing the
    # cutoff as a FILTER on the rank (not a CASE inside the aggregate) lets
    # Spark's WindowGroupLimit keep k rows per map partition BEFORE the
    # window's exchange — judgment lists are corpus-sized for pseudo-
    # judgment evals, so the unbounded form was a per-query (and, for a
    # single-query eval, single-partition) full sort. n_relevant still
    # counts ALL relevant docs, from its own map-side-combined aggregate.
    iw = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    # ideal-DCG top-k AND the n_relevant aggregate read this; judgment
    # derivations are join-shaped at the call sites, so compute them once
    rel_only = judgments.filter(F.col("rel") > 0).localCheckpoint(eager=False)
    ideal_topk = (
        rel_only.withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.col("rel") * _discount(F.col("irank"))).cast("decimal(18,6)")
            ).cast("double").alias("idcg"),
        )
    )
    ideal = (
        rel_only.groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_relevant"))
        .join(ideal_topk, "query_id", "left")
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

    One groupBy on the score + one TWO-PHASE distributed running sum over
    the group table (operators/ranks.py: score-range buckets, broadcast
    cumulative bucket totals, per-bucket partitioned windows) — for
    continuous model scores the distinct-score table is ≈ row-sized, so a
    single-partition cumulative window would be a full re-sort of the
    scored set on one task. Returns (n_pos, n_neg, auc); auc is NULL when
    either class is empty (undefined).

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
    from graphrag_toolkit_spark.operators import ranks

    g = g.localCheckpoint(eager=False)  # bounds + offsets + cumsum legs
    g = ranks.two_phase_cumsum(
        ranks.with_range_bucket(g, F.col("__s")),
        [F.asc("__s")],
        F.col("c"),
        out_col="cum",
    )
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


def calibration_bins(
    df: DataFrame, conf6_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Reliability-diagram bins for a binary classifier — the calibration
    half of classifier eval next to `binary_auc`'s discrimination half
    (ECE / Brier are the standard quality-filter audit metrics: a corpus
    gate whose confidence is miscalibrated silently over- or under-prunes).

    Takes confidence as a MICRO-GRID integer (`conf6_col`: BIGINT in
    [0, 10⁶] — produce it upstream with scaled-integer floor arithmetic,
    never a raw double) so binning has no float boundary: bin =
    least(conf6 div (10⁶/bins), bins−1). Per bin emits exact-BIGINT
    sufficient statistics — n, sum_conf6, n_pos, gap6 = |sum_conf6 −
    10⁶·n_pos| (the ECE numerator; Σ gap6 / (N·10⁶) is ECE) and sq_err12
    = Σ (conf6 − 10⁶·y)² (the Brier numerator; Σ sq_err12 / (N·10¹²) is
    the Brier score) — plus avg_conf and frac_pos as single
    exact-operand IEEE divisions. Double SUMS never cross the engine
    boundary; only integer sums do, so the table hash-gates under any
    partitioning.

    Scale shape: one projection + one `bins`-key aggregate — map-side
    partial combine makes the shuffle `bins` rows per task; nothing else
    moves."""
    if bins < 1 or 1_000_000 % bins != 0:
        raise ValueError("bins must divide 1,000,000")
    width = 1_000_000 // bins
    y6 = F.col(label_col).cast("long") * F.lit(1_000_000)
    c6 = F.col(conf6_col).cast("long")
    return (
        df.select(
            c6.alias("c6"),
            (c6 - y6).alias("err6"),
            F.col(label_col).cast("long").alias("y"),
        )
        # clamp BOTH ends: confidences outside [0, 10^6] (a buggy upstream
        # scaler) land in the edge bins instead of minting negative bins
        .withColumn(
            "bin", F.expr(f"greatest(least(c6 div {width}, {bins - 1}), 0)")
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("c6").alias("sum_conf6"),
            F.sum("y").alias("n_pos"),
            F.sum(F.col("err6") * F.col("err6")).alias("sq_err12"),
        )
        .select(
            "bin", "n", "sum_conf6", "n_pos",
            F.abs(
                F.col("sum_conf6") - F.lit(1_000_000) * F.col("n_pos")
            ).alias("gap6"),
            "sq_err12",
            (
                F.col("sum_conf6").cast("double")
                / (F.col("n") * F.lit(1_000_000)).cast("double")
            ).alias("avg_conf"),
            (F.col("n_pos").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
        )
    )


def cohen_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two binary raters — chance-corrected agreement
    for label-quality audits (two heuristic gates, or a model vs. a human
    sample: raw agreement is inflated when both raters mostly say "keep").

        kappa = (p_o − p_e) / (1 − p_e),  p_e = (a₁b₁ + a₀b₀)/N²

    EXACTNESS: over the common denominator the whole statistic is one
    exact-operand IEEE division of BIGINTs —
    kappa = (N·agree − a₁b₁ − a₀b₀) / (N² − a₁b₁ − a₀b₀) — and p_o, p_e
    are each a single integer-over-integer division, so the one-row
    result hash-gates (NULL kappa when p_e = 1: both raters constant).

    Scale shape: one full-corpus aggregate with map-side combine — four
    conditional counts, no shuffle beyond the single-row reduce.

    NULL pinning: rows where EITHER rater is NULL are excluded up front —
    an unrated row has no agreement status, and counting it in n while
    skipping it in the sums would skew p_o/p_e inconsistently."""
    df = df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
    a = F.col(a_col).cast("long")
    b = F.col(b_col).cast("long")
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((a == b).cast("long")).alias("n_agree"),
        F.sum(a).alias("a_pos"),
        F.sum(b).alias("b_pos"),
    )
    chance = (
        F.col("a_pos") * F.col("b_pos")
        + (F.col("n") - F.col("a_pos")) * (F.col("n") - F.col("b_pos"))
    )
    denom = F.col("n") * F.col("n") - chance
    return agg.select(
        "n", "n_agree", "a_pos", "b_pos",
        (F.col("n_agree").cast("double") / F.col("n").cast("double")).alias("p_o"),
        (chance.cast("double") / (F.col("n") * F.col("n")).cast("double")).alias(
            "p_e"
        ),
        F.when(
            denom != 0,
            (F.col("n") * F.col("n_agree") - chance).cast("double")
            / denom.cast("double"),
        ).alias("kappa"),
    )


def grouped_auc(
    scored: DataFrame,
    group_col: str,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Per-slice exact ROC-AUC — `binary_auc` partitioned by a group
    column: the fairness/robustness audit shape (a classifier that
    discriminates well overall can be no better than chance on one
    language, source, or domain slice; per-slice AUC is how corpus-filter
    bias is caught). Same integer Mann-Whitney statistic, same NULL
    pinning (NULL scores excluded, NULL labels count negative, NULL auc
    when a slice lacks a class); all ranks/windows are PARTITIONED by the
    group, so no global ordering exists anywhere.

    Scale shape: one (group, score) aggregate, one cumulative window over
    the distinct-score table partitioned by group, one per-group reduce —
    every stage keys on the group, so slices parallelize and a skewed
    slice degrades only itself."""
    scored = scored.filter(F.col(score_col).isNotNull())
    g = (
        scored.groupBy(F.col(group_col).alias("grp"), F.col(score_col).alias("__s"))
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                F.when(F.col(label_col).cast("boolean"), 1).otherwise(0)
            ).alias("pos"),
        )
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("__s")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    g = g.withColumn("cum", F.sum("c").over(w))
    s2_term = F.col("pos") * (2 * (F.col("cum") - F.col("c") + 1) + F.col("c") - 1)
    agg = g.groupBy("grp").agg(
        F.sum(s2_term).cast("bigint").alias("s2"),
        F.sum("pos").cast("bigint").alias("p"),
        F.sum("c").cast("bigint").alias("n_total"),
    )
    n_neg = F.col("n_total") - F.col("p")
    return agg.select(
        F.col("grp").alias(group_col),
        F.col("p").alias("n_pos"),
        n_neg.alias("n_neg"),
        F.when(
            (F.col("p") > 0) & (n_neg > 0),
            (F.col("s2") - F.col("p") * (F.col("p") + 1)).cast("double")
            / (2 * F.col("p") * n_neg).cast("double"),
        ).alias("auc"),
    )


def classification_report(
    df: DataFrame, score_col: str, label_col: str, threshold: float
) -> DataFrame:
    """Thresholded binary-classification report — the operating-point
    companion to `binary_auc` (ranking quality) and `calibration_bins`
    (probability quality): confusion counts + precision/recall/F1/accuracy
    at ONE decision threshold, which is what a deployed corpus gate
    actually runs.

    EXACTNESS: counts are conditional sums (BIGINT); each metric is a
    single exact-operand IEEE division (F1 over the common denominator
    2TP + FP + FN — never precision·recall over their sum, which would
    chain three divisions). NULL scores are EXCLUDED (no comparable
    decision — same pinning as `binary_auc`); NULL labels count negative.

    Scale shape: one map-side-combined full-corpus aggregate; a single
    row moves."""
    df = df.filter(F.col(score_col).isNotNull())
    pred = F.col(score_col) >= F.lit(threshold)
    y = F.col(label_col).cast("boolean")
    agg = df.agg(
        F.sum((pred & y).cast("long")).alias("tp"),
        F.sum((pred & ~F.coalesce(y, F.lit(False))).cast("long")).alias("fp"),
        F.sum((~pred & y).cast("long")).alias("fn"),
        F.sum((~pred & ~F.coalesce(y, F.lit(False))).cast("long")).alias("tn"),
    ).select(*[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("tp", "fp", "fn", "tn")])
    n = F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")
    return agg.select(
        "tp", "fp", "fn", "tn",
        F.when(
            F.col("tp") + F.col("fp") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fp")).cast("double"),
        ).alias("precision"),
        F.when(
            F.col("tp") + F.col("fn") > 0,
            F.col("tp").cast("double") / (F.col("tp") + F.col("fn")).cast("double"),
        ).alias("recall"),
        F.when(
            2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
            (2 * F.col("tp")).cast("double")
            / (2 * F.col("tp") + F.col("fp") + F.col("fn")).cast("double"),
        ).alias("f1"),
        F.when(
            n > 0,
            (F.col("tp") + F.col("tn")).cast("double") / n.cast("double"),
        ).alias("accuracy"),
    )
