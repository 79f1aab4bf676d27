"""KMV (k-minimum-values) distinct-count sketch.

North-star engine extension: corpus-scale cardinality profiling (distinct
users per segment, distinct n-grams per shard, vocabulary growth curves)
without holding the distinct set. A KMV sketch keeps the k smallest values
of a uniform hash; the k-th smallest value estimates the cardinality as
``(k-1) / kth_normalized`` (Bar-Yossef et al. 2002, the classic "distinct
elements in a stream" bottom-k estimator). Standard error ≈ 1/sqrt(k-2).

Why KMV and not HyperLogLog here: HLL implementations differ across engines
(register widths, bias correction), so ``approx_count_distinct`` can never
be oracle-gated. KMV is pure order statistics over md5 — both engines
compute the identical integers, so the ESTIMATE itself is hash-exact
against DuckDB while remaining a true sublinear sketch.

Scale shape: the map side reduces to distinct (group, hash) pairs (partial
dedup before the shuffle), the reduce side keeps k values per group — state
is O(groups × k) regardless of corpus size. Sketches are MERGEABLE: union
two groups' value lists and re-take the k smallest (``merge_sketches``),
which is how per-partition / per-day sketches roll up without re-scanning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 13 hex chars = 52 bits: exactly representable in a double, so the
# normalization divide (by 2^52, a power of two) is exact in IEEE double
# and both engines produce bit-identical estimates.
_HASH_HEX_CHARS = 13
_HASH_SPACE = float(1 << 52)


def kmv_hash(value: Column) -> Column:
    """Uniform 52-bit hash of any value via md5 of its string form."""
    return F.conv(
        F.substring(F.md5(value.cast("string")), 1, _HASH_HEX_CHARS), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Build one sketch row per group: ``(group_cols..., kmv: array<long>)``
    where ``kmv`` holds the (at most) k smallest distinct hash values,
    ascending. State per group is bounded by k."""
    group_cols = list(group_cols)
    # NULL values hash to NULL, which would sort first under the window and
    # burn one of the k slots while collect_list drops it — silently shrinking
    # the sketch to k-1 and flipping estimate_from_sketch into its exact-count
    # branch. NULL is not a distinct value; drop it up front (as the SQL
    # oracle's COUNT(DISTINCT) does).
    d = (
        df.select(*group_cols, kmv_hash(F.col(value_col)).alias("__h"))
        .filter(F.col("__h").isNotNull())
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("__h")
    return (
        d.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("__h")).alias("kmv"))
    )


def merge_sketches(a: Column, b: Column, k: int = 64) -> Column:
    """Merge two kmv arrays: union distinct, sort, keep the k smallest —
    the lossless roll-up (equal to sketching the unioned inputs)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def estimate_from_sketch(kmv: Column, k: int = 64) -> Column:
    """Distinct-count estimate from a sketch array: exact count when the
    group had fewer than k distinct values, else (k-1)/normalized-kth."""
    kth = F.element_at(kmv, k)
    return F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(F.lit(float(k - 1)) / (kth.cast("double") / F.lit(_HASH_SPACE)))


def kmv_distinct(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate: ``(group_cols..., distinct_est)``."""
    sk = kmv_sketch(df, group_cols, value_col, k)
    return sk.select(
        *group_cols, estimate_from_sketch(F.col("kmv"), k).alias("distinct_est")
    )


# --- count-min sketch --------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def cms_bucket(value: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-salted uniform bucket: md5("cms<row>|" + value) mod width."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{row}|"), value.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    return (h % width).cast("int")


def cms_build(
    df: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a value stream (Cormode & Muthukrishnan 2005):
    ``depth`` salted hash rows × ``width`` buckets of exact integer counts —
    (row, bucket, cnt). Point estimate = min over rows of the bucket count:
    never under-counts, over-counts by collisions bounded by 2N/width with
    probability 1−2^−depth.

    Why this sketch is oracle-gateable when most are not: it is pure
    integer arithmetic over md5 buckets — no floats anywhere — and
    MERGEABLE by plain (row, bucket) count addition, so per-shard sketches
    roll up with one groupBy. State is depth×width cells regardless of
    corpus size; the build is one narrow explode + one groupBy."""
    # the depth hash rows explode IN-ROW — the previous per-row self-union
    # re-read the value stream once per hash row; the exploded multiset is
    # identical and the count sum is order-free
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    rows = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        cms_bucket(F.col(value_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__rb"),
        w.alias("w"),
    ).select(
        F.col("__rb.row").alias("row"),
        F.col("__rb.bucket").alias("bucket"),
        "w",
    )
    return rows.groupBy("row", "bucket").agg(F.sum("w").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    queries: DataFrame,
    value_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for query values: (value, est) with
    est = min over rows of that row's bucket count (0 if bucket absent)."""
    probes = None
    for r in range(depth):
        part = queries.select(
            F.col(value_col).alias("value"),
            F.lit(r).alias("row"),
            cms_bucket(F.col(value_col), r, width).alias("bucket"),
        )
        probes = part if probes is None else probes.unionByName(part)
    return (
        probes.join(cms, ["row", "bucket"], "left")
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# --- Bloom filter ------------------------------------------------------------

BLOOM_BITS = 4096            # m: power of two so mod is a mask
BLOOM_HASHES = 5             # k


def _bloom_positions(value: Column, k: int, m: int) -> list[Column]:
    out = []
    for i in range(k):
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"bloom{i}|"), value.cast("string"))), 1, 13
            ),
            16,
            10,
        ).cast("long")
        out.append(h % m)
    return out


def bloom_build(
    df: DataFrame,
    value_col: str,
    k: int = BLOOM_HASHES,
    m: int = BLOOM_BITS,
) -> DataFrame:
    """Bloom filter over a key column — the build side of a runtime join
    filter (ship the KB-sized bitmap instead of shuffling the big side for
    a semi-join; false positives only re-admit rows the real join later
    drops, never lose one). Returned as (word_idx, word) — the m-bit map
    packed 32 bits per BIGINT word via bit-OR aggregation (32, not 64,
    so `1 << pos` never touches the sign bit in any engine): pure integer md5
    arithmetic, mergeable by ORing word pairs, engine-exact.

    Scale shape: ONE pass — the k positions explode in-row (the k
    per-hash projections previously re-read the build side k times via a
    self-union; the exploded multiset is identical, and bit_or is
    duplicate/order-free) into one m/64-cell aggregate; the word table is
    broadcast to probes. m and k follow the standard fp-rate calculus
    ((1−e^{−kn/m})^k) — size m to the build-side cardinality."""
    pos = df.select(
        F.explode(
            F.array(*_bloom_positions(F.col(value_col), k, m))
        ).alias("__p")
    ).select(
        F.expr("__p div 32").alias("word_idx"),
        F.expr("shiftleft(1L, cast(__p % 32 as int))").alias("bit"),
    )
    return pos.groupBy("word_idx").agg(
        F.bit_or("bit").alias("word")
    )


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str,
    k: int = BLOOM_HASHES,
    m: int = BLOOM_BITS,
) -> DataFrame:
    """Append ``might_contain`` (boolean) per row: true iff ALL k bit
    positions are set. The word table collapses to a ONE-ROW broadcast
    word_idx→word map (the previous shape joined it k times, embedding the
    whole build-side plan per hash); each probe is then k in-row map
    lookups — no shuffle of ``df``, one join total. A missing word is an
    all-zero word (same as the old left-join coalesce). The map is the
    same ≤ m/32-entry table the old path broadcast, just as one row."""
    bmap = bloom.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("__bm")
    )
    out = df.crossJoin(F.broadcast(bmap))
    cond = None
    for p in _bloom_positions(F.col(value_col), k, m):
        word = F.coalesce(
            # p ≥ 0 and a multiple-of-32 numerator: the double division is
            # exact, the long cast restores the map's key type
            F.element_at(
                F.col("__bm"), ((p - (p % 32)) / F.lit(32)).cast("long")
            ),
            F.lit(0).cast("long"),
        )
        # F.shiftleft only takes a literal shift amount; the SQL function
        # accepts a column
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (p % 32).cast("int")
        )
        c = word.bitwiseAND(bit) != 0
        cond = c if cond is None else (cond & c)
    return out.withColumn("might_contain", cond).drop("__bm")


# --- equi-width histogram quantile sketch ------------------------------------

def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    buckets: int = 64,
) -> DataFrame:
    """Mergeable quantile summary: equi-width integer bucket counts over
    [lo, hi) (values clamped to the edge buckets). State is `buckets` ints
    per sketch — mergeable by cell-wise addition like the CMS — and the
    bucket assignment is exact integer arithmetic on an exact-decimal
    offset, so sketches are engine- and partitioning-identical. The
    distributed fixed-memory stand-in for sort-based exact percentiles
    (the t-digest/KLL role, deterministic instead of sampled)."""
    width = (hi - lo) / buckets
    b = F.floor((F.col(value_col).cast("double") - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(b, F.lit(0)), F.lit(buckets - 1)).cast("int")
    # materialize the bucket as the NAMED column __hgb before the groupBy so
    # downstream plans show the aggregate keyed on it — planguard allowlists
    # __hgb-keyed aggregates as bounded (<= construction-fixed bucket count),
    # which is what licenses quantiles_from_histogram's cumulative window
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("__hgb", b)
        .groupBy(F.col("__hgb").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def quantiles_from_histogram(
    hist: DataFrame,
    qs: list[float],
    lo: float,
    hi: float,
    buckets: int = 64,
) -> DataFrame:
    """Quantile estimates from the bucket counts: for each q, rank
    r = floor(q·(n−1)) + 1 (1-based), found by cumulative count, linearly
    interpolated inside the bucket — every step integer arithmetic plus
    one exact-operand double division. Returns (q, est)."""
    width = (hi - lo) / buckets
    spark = hist.sparkSession
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("cum_before", F.col("cum") - F.col("n"))
    )
    total = hist.agg(F.sum("n").alias("total"))
    qdf = F.broadcast(
        spark.createDataFrame([{"q": float(q)} for q in qs])
    ).crossJoin(F.broadcast(total)).withColumn(
        "r", F.floor(F.col("q") * (F.col("total") - 1)).cast("bigint") + 1
    )
    hit = (
        qdf.join(cum, (F.col("cum") >= F.col("r")) & (F.col("cum_before") < F.col("r")))
    )
    est = (
        F.lit(lo)
        + F.lit(width)
        * (
            F.col("bucket").cast("double")
            + (F.col("r") - F.col("cum_before")).cast("double") / F.col("n")
        )
    )
    return hit.select("q", est.alias("est"))


# --- KMV set-operation estimates ---------------------------------------------

def kmv_intersection_estimate(a: Column, b: Column, k: int = 64) -> Column:
    """Estimated |A ∩ B| from two KMV sketches (Beyer et al. 2007, "On
    synopses for distinct-value estimation under multiset operations"):
    take the union sketch's k smallest values, measure the fraction ρ
    present in BOTH input sketches (a Jaccard estimator), and scale the
    union-cardinality estimate: est∩ = ρ · est∪.

    This is the sketch behind distributed join-size planning: per-shard
    KMV sketches of each side's key column merge losslessly, and the
    intersection estimate prices the join without touching either table
    again. Exactness: order statistics + one integer ratio × the KMV
    estimate — engine-identical, so even the ESTIMATE is oracle-gateable."""
    u = merge_sketches(a, b, k)
    common = F.size(F.array_intersect(u, F.array_intersect(a, b)))
    kth = F.element_at(u, F.least(F.size(u), F.lit(k)))
    est_union = F.when(
        F.size(u) < k, F.size(u).cast("double")
    ).otherwise(F.lit(float(k - 1)) / (kth.cast("double") / F.lit(_HASH_SPACE)))
    return (common.cast("double") / F.least(F.size(u), F.lit(k)).cast("double")) * est_union


# --- HyperLogLog -------------------------------------------------------------

HLL_M = 64          # registers (b = 6 index bits)
HLL_RANK_BITS = 46  # 52-bit hash minus the 6 index bits


def hll_registers(df: DataFrame, value_col: str, m: int = HLL_M) -> DataFrame:
    """Dense HyperLogLog register file (Flajolet, Fusy, Gandouet, Meunier
    2007): one 52-bit md5 hash per value; low log2(m) bits pick the
    register, the remaining 46 bits contribute rank = leading-zero count
    + 1 (computed as ``46 − (bitlength(w) − 1)`` via the binary-string
    length — pure integer, no log). Returns (idx, reg) with
    reg = max rank seen — MERGEABLE across shards/streams by plain
    (idx, max) groupBy, state is m integers no matter the corpus.

    Complements ``kmv_sketch``: KMV gives exact-below-k and supports
    intersections; HLL holds ~1.04/√m relative error in m bytes — the
    industry-standard cardinality register file (Redis PFCOUNT, BigQuery
    APPROX_COUNT_DISTINCT)."""
    hashed = hll_idx_rank(df, value_col, m)
    return hashed.groupBy("idx").agg(F.max("rank").cast("int").alias("reg"))


def hll_idx_rank(
    df: DataFrame, value_col: str, m: int = HLL_M, keep: Sequence[str] = (),
) -> DataFrame:
    """(keep..., idx, rank) per input row — the narrow JVM-side stage both
    the batch register build and the streaming state fold consume (the
    Python state stage in ``streaming/stateful.py`` only ever sees two
    small ints per row, never the values)."""
    h = kmv_hash(F.col(value_col))
    w = F.expr(f"__h div {m}")
    rank = F.when(
        w > 0,
        F.lit(HLL_RANK_BITS) - (F.length(F.bin(w)) - 1),
    ).otherwise(F.lit(HLL_RANK_BITS + 1))
    return (
        df.select(*keep, h.alias("__h"))
        .filter(F.col("__h").isNotNull())
        .select(*keep, (F.col("__h") % m).alias("idx"), rank.alias("rank"))
    )


def hll_estimate(registers: DataFrame, m: int = HLL_M) -> DataFrame:
    """HLL cardinality estimate from a register file: the harmonic-mean
    estimator α·m²/Σ2^(−reg) with the small-range linear-counting
    correction (raw ≤ 2.5m and empty registers present → m·ln(m/V)).

    EXACT-ARITHMETIC NOTE (why this sketch is hash-gateable): every
    harmonic term is ``1.0 / (1 << reg)`` — an exact power-of-two double,
    never libm pow — and the 64-term sum spans ≤ 2⁶·2⁴⁷ = 2⁵³ ulp range,
    so it is EXACT in any accumulation order; α is a shared literal; the
    one ln in the correction branch is quantized to the 6-decimal grid
    (word_entropy discipline). Returns one row
    (distinct_est, zero_registers, raw_est)."""
    alpha = 0.709  # α₆₄ (Flajolet et al., Fig. 3)
    spark = registers.sparkSession
    full = (
        spark.range(m).select(F.col("id").alias("idx"))
        .join(registers, "idx", "left")
        .select(F.coalesce("reg", F.lit(0)).alias("reg"))
    )
    agg = full.agg(
        F.sum(
            F.lit(1.0)
            / F.expr("shiftleft(cast(1 as bigint), reg)").cast("double")
        ).alias("s"),
        F.sum(F.when(F.col("reg") == 0, 1).otherwise(0)).cast("long").alias("v"),
    )
    raw = F.lit(alpha) * F.lit(float(m * m)) / F.col("s")
    lin = F.round(
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v").cast("double")), 6
    )
    return agg.select(
        F.when((raw <= 2.5 * m) & (F.col("v") > 0), lin)
        .otherwise(raw)
        .alias("distinct_est"),
        F.col("v").alias("zero_registers"),
        raw.alias("raw_est"),
    )
