"""Product quantization for embedding columns (north-star similarity-search
extras; the compressed-index leg beside ``ann.py``'s LSH/IVF candidates —
public recipe: Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the codebook-as-constant design mirrors FAISS).

A 64-dim float vector becomes ``n_sub`` small integer codes (here 8 codes of
4 bits at the default 16 centroids/subspace — 64×4 B → 8 B, a 32×
compression). Search uses **asymmetric distance computation** (ADC): the
query stays exact, each database vector contributes only its codes, and the
per-subspace distances come from a precomputed query→centroid lookup table.

100 TB shape — the whole point of PQ is that the codebook is TINY (n_sub ×
n_cent × sub_dim floats = 4 KB here), so it rides along as **expression
literals**, never a join side:

- **encode** is ONE narrow projection (no shuffle, no window): per subspace
  the 16 quantized distances are an inline array and the code is
  ``array_position(min)``. A petabyte corpus encodes as a map stage.
- **ADC scan** is likewise narrow: the LUT is a constant-foldable array
  expression; score = 8 ``element_at`` lookups summed. Top-k is the one
  ``TakeOrderedAndProject`` at the end.

Codebook "training" follows ``ann.first_c_centroids``: subvectors of the
first ``n_cent`` vectors by id — the deterministic, oracle-expressible
stand-in (relationally: ``ROW_NUMBER() OVER (ORDER BY id) <= C``); a
k-means upgrade per subspace would slot in exactly like
``ann.train_centroids_kmeans``.

All distance arithmetic uses the repo's decimal-quantization discipline
(``functions.vector.l2sq_quantized``) so codes and scores hash-match the
DuckDB oracle bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.functions.vector import (
    _DEC,
    _DEC_ACC,
    _quantize,
)

N_SUB = 8
N_CENT = 16


def codebook_first_c(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    n_cent: int = N_CENT,
) -> list[list[list[float]]]:
    """``codebook[s][c]`` = subvector ``s`` of the ``c``-th vector by id
    order. One tiny driver action (``n_cent`` rows) — the codebook is an
    index constant, like the LSH hyperplanes."""
    rows = (
        emb.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy("_id")
        .limit(n_cent)
        .collect()
    )
    dim = len(rows[0]["_v"])
    sub_dim = dim // n_sub
    return [
        [
            [float(x) for x in r["_v"][s * sub_dim : (s + 1) * sub_dim]]
            for r in rows
        ]
        for s in range(n_sub)
    ]


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(v) for v in vals])


def _cent_lit(cents: list[list[float]]) -> Column:
    """Quantized centroid matrix literal (n_cent × sub_dim decimals) —
    generated as ONE parsed SQL expression. Building it from per-element
    ``F.lit``/``F.round`` calls costs ~1000 py4j round-trips per subspace
    and dominates query construction time; a single ``expr`` parse is
    milliseconds. ``repr(float)`` round-trips exactly and the
    ROUND→DECIMAL cast is the same quantization the oracle applies."""
    inner = ",".join(
        "array("
        + ",".join(
            f"CAST(ROUND(CAST({float(x)!r} AS DOUBLE), 6) AS DECIMAL(12,6))"
            for x in c
        )
        + ")"
        for c in cents
    )
    return F.expr(f"array({inner})")


def _dists_to_cents(sub: Column, cents: list[list[float]]) -> Column:
    """Array of exact-decimal squared L2 distances from a quantized
    subvector to every centroid — ONE compact higher-order-function
    expression, not n_cent unrolled chains. Per-row work is tiny (n_cent ×
    sub_dim decimal ops); what matters is the EXPRESSION size: an unrolled
    form is ~1000 nodes per subspace and pushes plan compile time past any
    plausible scan time, while this stays a handful of nodes. Exactness is
    unchanged — decimal arithmetic is exact in any association."""
    return F.transform(
        _cent_lit(cents),
        lambda c: F.aggregate(
            F.zip_with(sub, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast(_DEC_ACC),
            lambda acc, v: (acc + v).cast(_DEC_ACC),
        ).cast("double"),
    )


def _sub_codes(qv: Column, codebook: list[list[list[float]]]) -> list[Column]:
    """One code column per subspace from a PRE-QUANTIZED decimal vector
    column: argmin of the squared L2 to each centroid literal;
    first-position tie-break = lowest centroid id."""
    sub_dim = len(codebook[0][0])
    cols = []
    for s, cents in enumerate(codebook):
        sub = F.slice(qv, s * sub_dim + 1, sub_dim)
        arr = _dists_to_cents(sub, cents)
        cols.append(
            (F.array_position(arr, F.array_min(arr)) - 1)
            .cast("int")
            .alias(f"code_{s}")
        )
    return cols


def encode(
    emb: DataFrame,
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    widen: bool = True,
) -> DataFrame:
    """(id, code_0..code_{n_sub-1}) — the compressed representation.
    The quantized vector is staged as one aliased column (referenced by
    every code expression, so CollapseProject keeps it materialized — one
    quantization pass per row). ``widen`` balances a narrow (few-file)
    input across the cluster before the CPU-heavy code computation; it is
    a no-op on already-wide scans, so the operator itself stays
    shuffle-free at real scale."""
    from graphrag_toolkit_spark.functions.skew import widen_partitions

    if widen:
        emb = widen_partitions(emb)
    pre = emb.select(
        F.col(id_col).alias("id"), _quantize(F.col(vec_col)).alias("_qv")
    )
    return pre.select("id", *_sub_codes(F.col("_qv"), codebook))


def adc_topk(
    codes: DataFrame,
    query_vec: list[float],
    codebook: list[list[list[float]]],
    k: int = 10,
) -> DataFrame:
    """ADC top-k over encoded vectors: (id, adc_dist, rank), ascending
    approximate distance, deterministic id tie-break. The LUT is a constant
    array expression per subspace — Catalyst folds it once; the scan never
    touches the original vectors."""
    n_sub = len(codebook)
    sub_dim = len(codebook[0][0])
    # distance expressions on literals are NOT constant-folded by Catalyst —
    # left inline they would re-evaluate the whole LUT per row. Evaluate the
    # n_sub×n_cent distances ONCE through a 1-row Spark job (same decimal
    # semantics as the oracle's SUM, so parity is preserved) and embed the
    # resulting doubles as plain literals.
    spark = codes.sparkSession
    lut_row = (
        spark.range(1)
        .select(
            *[
                _dists_to_cents(
                    _quantize(
                        _lit_vec(query_vec[s * sub_dim : (s + 1) * sub_dim])
                    ),
                    codebook[s],
                ).alias(f"d_{s}")
                for s in range(n_sub)
            ]
        )
        .head()
    )
    luts = [
        F.array(*[F.lit(float(v)) for v in lut_row[f"d_{s}"]])
        for s in range(n_sub)
    ]
    score = F.element_at(luts[0], F.col("code_0") + 1)
    for s in range(1, n_sub):
        score = score + F.element_at(luts[s], F.col(f"code_{s}") + 1)
    scored = codes.withColumn("adc_dist", score)
    # sort+limit first → TakeOrderedAndProject (distributed per-partition
    # top-k, no single-partition window over the corpus); the rank window
    # then runs over just k rows
    top = scored.orderBy(F.asc("adc_dist"), F.asc("id")).limit(k)
    w = Window.orderBy(F.asc("adc_dist"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "id", "adc_dist", "rank"
    )


def quantize_int8(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column — the
    standard vector-index compression knob one notch lighter than PQ
    (4 B float → 1 B code, per-vector scale; what FAISS calls SQ8 /
    every vector DB's "int8" storage option):

        scale   = max_i |v_i|
        code_i  = floor(v_i · 127 / scale)   ∈ [-127, 127]

    EXACTNESS (hash-gate discipline): inputs go through the repo's
    standard 10⁻⁶ decimal quantization; the per-vector scale is an exact
    DECIMAL max; the code arithmetic is decimal→double cast (correctly
    rounded, engine-identical), one IEEE multiply, one IEEE division,
    then FLOOR — floor avoids round-half boundary ambiguity entirely, at
    the cost of a ≤1-ulp systematic down-bias that both engines share.
    A GREATEST(-127) clamp pins the documented symmetric range: for
    v = -scale the two IEEE roundings can land one ulp below -127 and
    floor would mint -128, outside the contract (and invisible to the
    |code|==127 saturation counters). Zero vectors quantize to all-zero
    codes (scale 0 guarded).

    Scale shape: ONE narrow projection — no shuffle, no join, no window;
    a petabyte corpus quantizes as a map stage, same as ``encode``.

    The quantized array and its max-abs scale are materialized as named
    columns across projection boundaries: inlining them into the codes
    lambda makes Catalyst re-evaluate BOTH per element (64×64 decimal ops
    per row — measured 22.6 s → 1-2 s at sf0.1 for this exact reason)."""
    prepped = emb.select(
        F.col(id_col).alias("id"),
        _quantize(F.col(vec_col)).alias("_q"),
    ).select(
        "id", "_q",
        F.array_max(F.transform("_q", lambda x: F.abs(x))).alias("_s"),
    )
    s_dbl = F.col("_s").cast("double")
    codes = F.transform(
        "_q",
        lambda x: F.when(F.col("_s") == 0, F.lit(0)).otherwise(
            F.greatest(
                F.floor(x.cast("double") * F.lit(127.0) / s_dbl),
                F.lit(-127),
            )
        ).cast("int"),
    )
    return prepped.select(
        "id",
        s_dbl.alias("scale"),
        codes.alias("codes"),
    )


def truncation_audit(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    keep_dims: int,
    threshold: float,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Matryoshka-style dimension-truncation audit: how much retrieval
    signal survives keeping only the FIRST ``keep_dims`` components —
    the measurement behind the standard index cost cut (half the dims =
    half the scan bytes and ANN memory; MRL-trained embeddings are built
    for exactly this truncation, Kusupati et al. 2022). Complements the
    magnitude-quantization audits above (SQ8/PQ shrink per-component
    precision; truncation drops components).

    Over LSH-bucketed candidate pairs (the same sign-plane buckets the
    dedup path uses — NEVER all pairs), computes the exact quantized
    cosine at full dim and at ``keep_dims``, and reports ONE row:
    (n_pairs, agree_rate — fraction of pairs where both scores land on
    the same side of ``threshold``, mean_abs_delta, corr — Pearson of the
    two scores on the decimal grid).

    EXACTNESS: each cosine is the established exact-operand discipline
    (decimal dot / product of decimal-sum norms); deltas and the
    correlation moments are grid-quantized to DECIMAL before any SUM, so
    no double sum ever crosses the engine boundary; the final divisions
    are single IEEE ops on exact operands (zipf_fit's regression rule).

    Scale shape: ONE per-vector projection (quantize + slice + norms +
    bucket, checkpointed once), one bucket equi-join, one scalar
    aggregate — no global window, no all-pairs stage."""
    from graphrag_toolkit_spark.functions.vector import (
        _DEC_ACC,
        dot_prequantized,
        prequantize,
    )
    from graphrag_toolkit_spark.operators import ann
    from graphrag_toolkit_spark.operators.vss import query_vector_lit

    def _norm_prequantized(q: Column) -> Column:
        sq = F.aggregate(
            F.zip_with(q, q, lambda x, y: x * y),
            F.lit(0).cast(_DEC_ACC),
            lambda acc, v: (acc + v).cast(_DEC_ACC),
        ).cast("double")
        return F.sqrt(sq)

    # quantize ONCE; the head slice of the quantized array equals the
    # quantization of the head slice (element-wise op), and the bucket's
    # plane dots take the prequantized vector — 7 fewer per-row quantize
    # passes than the naive form (codegen size, not just arithmetic)
    planes = ann.hyperplanes(n_planes, dim)
    qplanes = [prequantize(query_vector_lit(p)) for p in planes]
    stage1 = emb.select(
        F.col(id_col).alias("id"), prequantize(F.col(vec_col)).alias("qf")
    )
    qh = F.slice(F.col("qf"), 1, keep_dims)
    bucket_bits = [
        F.when(dot_prequantized(F.col("qf"), qp) >= 0, F.lit("1")).otherwise("0")
        for qp in qplanes
    ]
    prepped = stage1.select(
        "id",
        "qf",
        _norm_prequantized(F.col("qf")).alias("nf"),
        qh.alias("qh"),
        _norm_prequantized(qh).alias("nh"),
        F.concat(*bucket_bits).alias("bucket"),
    ).localCheckpoint(eager=True)
    a = prepped.withColumnsRenamed(
        {"id": "id_a", "qf": "qfa", "nf": "nfa", "qh": "qha", "nh": "nha"}
    )
    b = prepped.withColumnsRenamed(
        {"id": "id_b", "qf": "qfb", "nf": "nfb", "qh": "qhb", "nh": "nhb"}
    )
    pairs = (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            (
                dot_prequantized(F.col("qfa"), F.col("qfb"))
                / (F.col("nfa") * F.col("nfb"))
            ).alias("cf"),
            (
                dot_prequantized(F.col("qha"), F.col("qhb"))
                / (F.col("nha") * F.col("nhb"))
            ).alias("ch"),
        )
    )
    x6 = F.round(F.col("cf"), 6).cast(_DEC)
    y6 = F.round(F.col("ch"), 6).cast(_DEC)
    d6 = F.round(F.abs(F.col("cf") - F.col("ch")), 6).cast(_DEC)
    th = F.lit(threshold)
    agree = ((F.col("cf") >= th) == (F.col("ch") >= th)).cast("int")
    g = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(agree).cast("bigint").alias("n_agree"),
        F.sum(d6).alias("sd"),
        F.sum(x6).alias("sx"),
        F.sum(y6).alias("sy"),
        F.sum((x6 * y6).cast("decimal(28,12)")).alias("sxy"),
        F.sum((x6 * x6).cast("decimal(28,12)")).alias("sxx"),
        F.sum((y6 * y6).cast("decimal(28,12)")).alias("syy"),
    )
    n = F.col("n_pairs").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    den = F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    return g.select(
        "n_pairs",
        (F.col("n_agree").cast("double") / n).alias("agree_rate"),
        (F.col("sd").cast("double") / n).alias("mean_abs_delta"),
        F.when(den > 0, (n * sxy - sx * sy) / den).alias("corr"),
    )


def residual_codebook_first_c(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_sub: int = N_SUB,
    n_cent: int = N_CENT,
) -> list[list[list[float]]]:
    """IVF-PQ codebook: subvectors of the RESIDUALS (vector − assigned
    coarse centroid) of the first ``n_cent`` vectors by id — the residual
    twin of ``codebook_first_c`` (FAISS IVFPQ trains PQ on residuals
    because they're far better centered than raw vectors). One tiny
    driver action; python float arithmetic IS IEEE double, identical to
    the engine's CAST(float AS DOUBLE) subtraction."""
    from graphrag_toolkit_spark.operators import ann

    assigned = ann.ivf_assign(emb, centroids, id_col, vec_col)
    cmap = {
        r["cid"]: [float(x) for x in r["embedding"]]
        for r in centroids.select("cid", "embedding").collect()
    }
    rows = assigned.orderBy("id").limit(n_cent).collect()
    dim = len(rows[0]["embedding"])
    sub_dim = dim // n_sub
    residuals = [
        [float(r["embedding"][j]) - cmap[r["cid"]][j] for j in range(dim)]
        for r in rows
    ]
    return [
        [res[s * sub_dim : (s + 1) * sub_dim] for res in residuals]
        for s in range(n_sub)
    ]


def ivf_pq_topk(
    emb: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    codebook: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 2,
    k: int = 10,
) -> DataFrame:
    """IVF-PQ ANN (the FAISS IVFPQ architecture, composed from this
    repo's gated primitives): coarse-quantize every vector to its nearest
    centroid list, PQ-encode the RESIDUAL, and answer a query by probing
    the ``nprobe`` nearest lists with a per-list ADC lookup table built
    from the QUERY's residual against that list's centroid. Returns
    (id, cid, adc_dist, rank), ascending approximate distance.

    Scale shape: the index build is one broadcast-assign pass + one
    narrow encode projection (codes = n_sub small ints per vector — the
    32x compression that makes a 100 TB corpus scannable); the query
    side touches ONLY the probed lists (cid IN-filter → partition-
    prunable on a cid-partitioned layout), scores each candidate with
    n_sub constant-array lookups (no original vectors read), and top-k
    is a distributed TakeOrderedAndProject. LUTs are evaluated once
    through a 1-row job (decimal semantics identical to the oracle) and
    embedded as literals, exactly like ``adc_topk``."""
    from graphrag_toolkit_spark.operators import ann

    n_sub = len(codebook)
    sub_dim = len(codebook[0][0])
    spark = emb.sparkSession

    assigned = ann.ivf_assign(emb, centroids, id_col, vec_col)
    cb = F.broadcast(centroids.select("cid", F.col("embedding").alias("_cemb")))
    # quantized residual: float→double casts BEFORE the subtraction (a
    # float-float difference would be single-precision; the oracle
    # subtracts doubles)
    qr = F.zip_with(
        F.col("embedding"),
        F.col("_cemb"),
        lambda x, y: F.round(x.cast("double") - y.cast("double"), 6).cast(_DEC),
    )
    codes = (
        assigned.join(cb, "cid")
        .select("id", "cid", qr.alias("_qr"))
        .select("id", "cid", *_sub_codes(F.col("_qr"), codebook))
    )

    # probe selection: nprobe nearest centroids by the quantized cosine —
    # a driver action on the (tiny) centroid table, like the kmeans seeds
    from graphrag_toolkit_spark.functions.vector import cosine_similarity_quantized
    from graphrag_toolkit_spark.operators.vss import query_vector_lit

    probe_rows = (
        centroids.select(
            "cid",
            F.col("embedding").alias("_cemb"),
            cosine_similarity_quantized(
                F.col("embedding"), query_vector_lit(query_vec)
            ).alias("_s"),
        )
        .orderBy(F.desc("_s"), F.asc("cid"))
        .limit(nprobe)
        .collect()
    )
    # per-probe LUT over the QUERY RESIDUAL, one 1-row job (adc_topk's rule:
    # distance expressions on literals are not constant-folded — left inline
    # they re-evaluate per scanned row)
    lut_exprs = []
    for r in probe_rows:
        rq = [float(query_vec[j]) - float(r["_cemb"][j]) for j in range(len(query_vec))]
        for s in range(n_sub):
            lut_exprs.append(
                _dists_to_cents(
                    _quantize(_lit_vec(rq[s * sub_dim : (s + 1) * sub_dim])),
                    codebook[s],
                ).alias(f"d_{r['cid']}_{s}")
            )
    lut_row = spark.range(1).select(*lut_exprs).head()

    probe_cids = [r["cid"] for r in probe_rows]
    score = None
    for cid in probe_cids:
        chain = F.element_at(
            F.array(*[F.lit(float(v)) for v in lut_row[f"d_{cid}_0"]]),
            F.col("code_0") + 1,
        )
        for s in range(1, n_sub):
            chain = chain + F.element_at(
                F.array(*[F.lit(float(v)) for v in lut_row[f"d_{cid}_{s}"]]),
                F.col(f"code_{s}") + 1,
            )
        score = (
            F.when(F.col("cid") == cid, chain)
            if score is None
            else score.when(F.col("cid") == cid, chain)
        )
    scored = codes.filter(F.col("cid").isin(probe_cids)).withColumn(
        "adc_dist", score
    )
    top = scored.orderBy(F.asc("adc_dist"), F.asc("id")).limit(k)
    w = Window.orderBy(F.asc("adc_dist"), F.asc("id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "id", "cid", "adc_dist", "rank"
    )
