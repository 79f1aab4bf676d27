"""Vector math as native Spark SQL higher-order functions (SURVEY.md §2.5).

Parity target: the reference's in-memory cosine top-k
(``retrieval/utils/statement_utils.py:15-95``) and the vector-store kNN scans
(OpenSearch/pgvector). Here similarity is a *column expression* — JVM-side,
codegen-compiled, no UDF — so a brute-force top-k is a single scan + sort, and
the same expression serves as the exact-scoring leg of the ANN operators.

Precision discipline: elements are cast to double *before* multiply/accumulate
and folded left-to-right, which matches an unnest-and-sum oracle in DuckDB
bit-for-bit (both engines then perform the identical IEEE double sequence).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Σ a_i * b_i with double accumulation, sequential order."""
    products = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    ad = _to_double(a)
    sq = F.aggregate(
        F.zip_with(ad, ad, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot / (|a| |b|); NaN-safe only insofar as inputs are non-zero vectors
    (fixture embeddings are unit-norm, prod embeddings are model outputs)."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit_normalize(a: Column) -> Column:
    n = l2_norm(a)
    return F.transform(_to_double(a), lambda x: x / n)


# --- quantized (decimal-exact) variants --------------------------------------
# Summing doubles is order-sensitive; Spark's partial aggregation and another
# engine's accumulator can disagree in the last ulps. For oracle-gated
# queries we round each element to a decimal grid first: decimal sums are
# exact in ANY order, so both engines produce bit-identical scores. The plain
# double versions above remain the hot path.

_DEC = "decimal(12,6)"
# accumulator: scale 12 (products of two scale-6 decimals), with enough
# integral headroom that acc+v never exceeds precision 38 — the sum is exact
# and the cast back to the accumulator type is lossless.
_DEC_ACC = "decimal(25,12)"


def _quantize(vec: Column) -> Column:
    return F.transform(vec, lambda x: F.round(x.cast("double"), 6).cast(_DEC))


def dot_quantized(a: Column, b: Column) -> Column:
    products = F.zip_with(_quantize(a), _quantize(b), lambda x, y: x * y)
    return F.aggregate(
        products, F.lit(0).cast(_DEC_ACC), lambda acc, v: (acc + v).cast(_DEC_ACC)
    ).cast("double")


def l2_norm_quantized(a: Column) -> Column:
    q = _quantize(a)
    sq = F.aggregate(
        F.zip_with(q, q, lambda x, y: x * y),
        F.lit(0).cast(_DEC_ACC),
        lambda acc, v: (acc + v).cast(_DEC_ACC),
    ).cast("double")
    return F.sqrt(sq)


def cosine_similarity_quantized(a: Column, b: Column) -> Column:
    return dot_quantized(a, b) / (l2_norm_quantized(a) * l2_norm_quantized(b))


def prequantize(vec: Column) -> Column:
    """Quantize once, reuse many times: for pairwise workloads, store the
    decimal array per vector and use ``dot_prequantized`` in the pair stage —
    quantizing inside an O(n²) join wastes most of the work."""
    return _quantize(vec)


def l2sq_quantized(a: Column, b: Column) -> Column:
    """Squared L2 distance Σ (a_i − b_i)² on the decimal grid: quantize both
    inputs to scale 6, diff and square exactly, accumulate in decimal (exact
    in any order), cast to double last — same oracle-parity discipline as
    ``dot_quantized``."""
    diffs = F.zip_with(_quantize(a), _quantize(b), lambda x, y: (x - y) * (x - y))
    return F.aggregate(
        diffs, F.lit(0).cast(_DEC_ACC), lambda acc, v: (acc + v).cast(_DEC_ACC)
    ).cast("double")


def dot_prequantized(a: Column, b: Column) -> Column:
    """Dot of two already-quantized decimal arrays (see ``prequantize``)."""
    products = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(
        products, F.lit(0).cast(_DEC_ACC), lambda acc, v: (acc + v).cast(_DEC_ACC)
    ).cast("double")


def jl_sign_matrix(in_dim: int, out_dim: int) -> list[list[int]]:
    """Deterministic ±1 projection matrix for `jl_project`: sign(i, j) from
    the parity of md5("jl|i|j")'s first hex digit — reproducible anywhere
    (the DuckDB oracle inlines the same literals), no RNG state. Achlioptas
    (2003) showed ±1 entries satisfy the Johnson-Lindenstrauss lemma like
    Gaussians do."""
    import hashlib

    return [
        [
            1 - 2 * (int(hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[0], 16) % 2)
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def jl_project(vec: Column, in_dim: int, out_dim: int) -> Column:
    """Johnson-Lindenstrauss random projection to ``out_dim`` dims:
    y_j = (Σ_i sign(i,j)·q(x_i)) / √out_dim — the dimensionality-reduction
    front-end for ANN at scale (project 768-dim model embeddings to 16-64
    dims before LSH/IVF bucketing; pairwise distances survive within
    ±ε w.h.p.). Returns array<double>, element order preserved.

    Exactness: inputs are quantized to the 6-decimal grid, signs are ±1
    integers, so each output sum is an EXACT decimal in any fold order;
    pick ``out_dim`` a power of four (16, 64) and the √out_dim divisor is
    an exact power of two, keeping the final division engine-identical.
    Cost: out_dim × in_dim multiply-adds per row, all whole-stage codegen
    — a narrow projection, no shuffle, no UDF. ``in_dim`` must equal the
    actual vector length: shorter vectors NULL-pad through zip_with and
    the affected outputs become NULL (visible, not silently wrong)."""
    import math

    signs = jl_sign_matrix(in_dim, out_dim)
    q = _quantize(vec)
    inv_norm = 1.0 / math.sqrt(out_dim)
    outs = []
    for j in range(out_dim):
        row = F.array(*[F.lit(s) for s in signs[j]])
        s_j = F.aggregate(
            F.zip_with(q, row, lambda x, sgn: (x * sgn.cast("decimal(2,0)")).cast("decimal(14,6)")),
            F.lit(0).cast("decimal(25,6)"),
            lambda acc, v: (acc + v).cast("decimal(25,6)"),
        ).cast("double")
        outs.append(s_j * F.lit(inv_norm))
    return F.array(*outs)


def gram_matrix(df, vec_col: str, dim: int):
    """Distributed Gram/scatter matrix G[i,j] = Σ_rows q(x_i)·q(x_j) —
    the 64×64 (dim²) aggregate behind PCA/whitening/covariance over a
    corpus of embeddings: the CORPUS-sized work is one narrow pass + one
    tiny aggregate; the dim×dim result is driver/dimension-sized, which is
    why distributed PCA is cheap (eigendecomposition happens on G, not on
    the data). Returns long-format (i, j, value) for j ≥ i (symmetric
    upper triangle), exact decimal sums cast to double.

    Exactness: elements quantized to the 6-decimal grid first, products
    exact decimals, sums exact in any order — hash-gateable like every
    decimal aggregate here."""
    from pyspark.sql import functions as F

    q = _quantize(F.col(vec_col))
    pairs = F.explode(
        F.expr(
            f"""flatten(transform(sequence(0, {dim - 1}), i ->
                 transform(sequence(i, {dim - 1}), j ->
                   struct(i, j, cast(__q[i] as decimal(12,6))
                            * cast(__q[j] as decimal(12,6)) as p))))"""
        )
    ).alias("e")
    # products keep their FULL scale-12 precision through the sum — rounding
    # them back to the 6-decimal grid would hit .5e-6 ties constantly
    # (grid×grid products are exact 12-decimal values) where engines'
    # decimal-cast rounding can disagree; scale 12 is exactly the safe
    # bound for the final decimal→double cast
    return (
        df.select(q.alias("__q"))
        .select(pairs)
        .select("e.i", "e.j", F.col("e.p").cast("decimal(28,12)").alias("p"))
        .groupBy("i", "j")
        .agg(F.sum("p").cast("double").alias("value"))
    )


def pca_components(gram_rows, dim: int, k: int):
    """Top-k principal directions from a collected `gram_matrix` result —
    the DRIVER-side eigendecomposition (dim×dim floats: dimension-sized,
    the same legitimate driver boundary as the ANN centroid seeds and the
    PQ codebook; the corpus never leaves the cluster). Returns a
    (k × dim) list-of-lists with a deterministic sign convention (largest-
    |coordinate| entry made positive; ties broken by lowest index).
    numpy's symmetric eigensolver is deterministic for a fixed matrix but
    NOT grid-exact across BLAS builds — so PCA projection is test-bound,
    while the Gram matrix itself is the oracle-gated artifact."""
    import numpy as np

    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r["i"], r["j"]] = r["value"]
        g[r["j"], r["i"]] = r["value"]
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    out = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:
            v = -v
        out.append([float(x) for x in v])
    return out
