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
