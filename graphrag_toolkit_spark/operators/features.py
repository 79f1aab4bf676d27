"""Feature-engineering operators for training-data pipelines.

North-star additions (no reference counterpart — the reference stops at
retrieval; these are the tabular-feature stages a model-training pipeline
runs on the same corpus):

- ``target_encode``: leave-one-out mean-target encoding of a categorical
  column — THE classic high-cardinality categorical feature, with the
  leakage guard built in (each row's own target is excluded from its
  encoding). One groupBy over the category; the per-row LOO value is a
  broadcast-join + arithmetic, exact decimals end to end.
- ``negative_samples``: deterministic hash-ring negative sampling for
  contrastive training — each anchor draws k candidates at positions
  ``(hash(anchor) + j·stride) mod N`` of the hash-ordered corpus ring.
  No RNG state, no corpus shuffle per anchor: one dense index build
  (window) + an equi-join on ring position; reproducible across runs,
  engines, and partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.operators.sampling import hash_value


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    prior_weight: int = 0,
) -> DataFrame:
    """Append ``te_<cat_col>``: the mean target of the row's category
    computed WITHOUT the row itself (leave-one-out — the standard leakage
    guard). Optional additive smoothing toward the global mean with
    ``prior_weight`` pseudo-observations:

        te = (cat_sum − y + m·global_mean) / (cat_n − 1 + m)

    Exactness: sums are DECIMAL (2-decimal money targets stay exact), the
    global mean enters as an exact ratio (its numerator/denominator are
    carried separately so no rounded intermediate leaks in), and the one
    division runs on exact double operands. Singleton categories with no
    smoothing fall back to the global mean (their LOO set is empty)."""
    q = F.round(F.col(target_col), 2).cast("decimal(18,2)")
    d = df.withColumn("__y", q)
    stats = d.groupBy(cat_col).agg(
        F.sum("__y").alias("__cat_sum"), F.count(F.lit(1)).alias("__cat_n")
    )
    glob = d.agg(
        F.sum("__y").alias("__g_sum"), F.count(F.lit(1)).alias("__g_n")
    )
    m = F.lit(prior_weight)
    # per-category stats grow with the category domain (this is the
    # HIGH-cardinality encoder by design) — no hint on stats; the 1-row
    # global stays hinted
    out = d.join(stats, cat_col).crossJoin(F.broadcast(glob))
    g_mean = F.col("__g_sum").cast("double") / F.col("__g_n")
    loo_n = (F.col("__cat_n") - 1 + m).cast("double")
    te = F.when(
        loo_n > 0,
        (
            (F.col("__cat_sum") - F.col("__y")).cast("double")
            + m.cast("double") * g_mean
        )
        / loo_n,
    ).otherwise(g_mean)
    return out.withColumn(f"te_{cat_col}", te).drop(
        "__y", "__cat_sum", "__cat_n", "__g_sum", "__g_n"
    )


def negative_samples(
    corpus: DataFrame,
    anchors: DataFrame,
    id_col: str,
    anchor_col: str,
    k: int = 4,
    stride: int = 7919,
) -> DataFrame:
    """For each anchor id, k deterministic negatives from the corpus hash
    ring: candidates at ring positions ``(hash(anchor) + j·stride) mod N``
    for j = 1..k (prime stride scatters consecutive j across the ring),
    dropping the accidental self-match. Returns (anchor, j, neg_id): at
    most k rows per anchor — k−1 when the self-match fires, and fewer
    DISTINCT neg_ids when two j values land on the same ring position
    (possible whenever k·stride wraps the ring, i.e. n < k·stride; rows
    keep their distinct j, so duplicates are detectable downstream).

    Raises ``ValueError`` on an empty corpus (ring positions would be
    modulo-zero → silently empty output).

    Scale shape: the ring index is the TWO-PHASE distributed rank over
    hash order (operators/ranks.py — the 2^28 hash domain's top 10 bits
    are the monotone coarse bucket, so no single-partition sort ever sees
    the corpus; built once per corpus snapshot, reusable across anchor
    batches); sampling is a narrow position explode on the anchor side +
    an equi-join on position — no per-anchor corpus scan, no RNG."""
    from graphrag_toolkit_spark.operators import ranks

    n = corpus.count()
    if n == 0:
        raise ValueError("negative_samples: corpus is empty (no ring to sample)")
    hashed = corpus.select(
        F.col(id_col).alias("neg_id"),
        hash_value(F.col(id_col)).alias("__hv"),
    ).withColumn(ranks.BUCKET_COL, F.expr("__hv div 262144"))  # 2^28 / 2^18 → ≤1024
    ring = ranks.two_phase_row_number(
        hashed, [F.asc("__hv"), F.asc("neg_id")], out_col="__rn"
    ).select("neg_id", (F.col("__rn") - 1).alias("__pos"))
    probes = anchors.select(
        F.col(anchor_col).alias("anchor"),
        F.explode(F.sequence(F.lit(1), F.lit(k))).alias("j"),
    ).withColumn(
        "__pos",
        (hash_value(F.col("anchor")) + F.col("j") * F.lit(stride)) % F.lit(n),
    )
    return (
        probes.join(ring, "__pos")
        .filter(F.col("neg_id") != F.col("anchor"))
        .select("anchor", "j", "neg_id")
    )


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    k: int = 5,
) -> DataFrame:
    """Contrastive HARD negatives: for each anchor, the top-k most
    cosine-similar corpus items with a DIFFERENT label — the near-boundary
    negatives that make contrastive/triplet training effective, which the
    random hash-ring sampler (``negative_samples``) cannot find by design
    (it optimizes for cheap uniform coverage, not difficulty). Returns
    (anchor_id, neg_id, neg_label, score, rank).

    Exactness: prequantized-decimal dot/norm (functions/vector.py) — the
    same engine-identical cosine the oracle-gated VSS queries use.

    Scale shape: the anchor batch broadcasts against the corpus scan (one
    narrow pass, distributed top-k per anchor via window-rank — the VSS
    brute-force shape, fine for anchor batches × 100 TB because only the
    corpus side scales). For mining over EVERY corpus row as anchor, swap
    candidate generation to the bucketed ANN probes (``operators/ann.py``)
    and exact-rerank the bucket — same re-rank expression.

    NULL labels: a NULL on either side makes ``neg_label != anchor_label``
    NULL → the row is dropped, so NULL-labeled anchors get no negatives
    and NULL-labeled corpus rows are never candidates (three-valued logic,
    stated rather than silently surprising)."""
    from graphrag_toolkit_spark.functions.vector import (
        dot_prequantized,
        l2_norm_quantized,
        prequantize,
    )

    cat = corpus.select(
        F.col(id_col).alias("neg_id"),
        prequantize(F.col(vec_col)).alias("cv"),
        l2_norm_quantized(F.col(vec_col)).alias("cn"),
        F.col(label_col).alias("neg_label"),
    )
    anc = F.broadcast(
        anchors.select(
            F.col(id_col).alias("anchor_id"),
            prequantize(F.col(vec_col)).alias("av"),
            l2_norm_quantized(F.col(vec_col)).alias("an"),
            F.col(label_col).alias("_albl"),
        )
    )
    scored = (
        cat.crossJoin(anc)
        .filter(F.col("neg_label") != F.col("_albl"))
        .withColumn(
            "score",
            dot_prequantized(F.col("cv"), F.col("av"))
            / (F.col("cn") * F.col("an")),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.desc("score"), F.asc("neg_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("anchor_id", "neg_id", "neg_label", "score", "rank")
    )


def pareto_frontier(
    df: DataFrame, max_col: str, min_col: str
) -> DataFrame:
    """2-D Pareto frontier (skyline): the points not weakly dominated when
    MAXIMIZING `max_col` and MINIMIZING `min_col` — the curation-tradeoff
    primitive ("largest parts at the lowest price", "longest documents
    with the least repetition"): every selection policy that's monotone
    in both axes picks from this frontier.

    Returns distinct frontier POINTS ``(x, y, n_rows)`` (n_rows = ties at
    the point); join back on (x, y) to recover ids. A point survives iff
    y equals its x-group minimum AND is strictly below every higher-x
    group's minimum (weak dominance: x'≥x ∧ y'<y, or x'>x ∧ y'≤y kills).

    EXACTNESS: comparisons and counts only — nothing is computed, so any
    exactly-stored column types work.

    Scale shape: one (x, y) aggregate over the data, then the skyline
    scan runs on the DISTINCT-X table via the two-phase exclusive prefix
    min (`ranks.two_phase_prefix_min_excl`, bucketed on −x) — x's
    cardinality is data-dependent (a price axis is near-continuous), so
    the running-min never single-partitions regardless of axis domain."""
    from graphrag_toolkit_spark.operators import ranks

    pts = df.groupBy(F.col(max_col).alias("x"), F.col(min_col).alias("y")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    per_x = pts.groupBy("x").agg(F.min("y").alias("min_y"))
    keep = (
        ranks.two_phase_prefix_min_excl(
            ranks.with_range_bucket(per_x, -F.col("x")),
            [F.desc("x")],
            F.col("min_y"),
            out_col="best_higher",
        )
        .filter(
            F.col("best_higher").isNull()
            | (F.col("min_y") < F.col("best_higher"))
        )
        .select("x", F.col("min_y").alias("y"))
    )
    return pts.join(keep, ["x", "y"]).select("x", "y", "n_rows")
