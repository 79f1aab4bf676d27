"""Iterative graph centrality (truncated Katz index).

North-star analytics extension beyond the reference's degree scoring
(`rollup.entity_degree`, reference `entity_context_provider.py:126-141`):
a PageRank-family importance score that weighs paths, not just immediate
edges — ranking hub entities/suppliers for retrieval seeding or corpus
curation. Truncated Katz with attenuation α = 1/2^b over K iterations:

    r_0(v)     = 1
    r_{t+1}(v) = 1 + α · Σ_{u→v} r_t(u)

Two exactness regimes, one per algorithm family:

- Katz (power-of-two α) needs NO division at all once ranks are pre-scaled
  by 2^(b·K): every value stays an exact BIGINT through all iterations
  (each halving hits an even number by induction) — bit-identical in any
  engine and partitioning; the final divide by 2^(b·K) is an exact
  power-of-two double op.
- PageRank (``pagerank`` below) DOES divide by out-degree, which no integer
  trick can absorb — so each per-edge message is quantized to the
  6-decimal grid immediately after the one double division (both operands
  exactly representable, so quotient + half-up rounding are
  engine-identical) and everything else stays exact decimal arithmetic.
  Same discipline as ``textstats.word_entropy``.

Scale shape: the classic message-passing loop — per iteration one
edge⋈ranks equi-join and one sum per destination (map-side partial
aggregation applies; longs sum associatively). Ranks are localCheckpointed
per round to keep lineage flat; the edge table is persisted across rounds.
Skewed in-degree is ordinary aggregation skew (AQE / two-phase salting via
`functions/skew.py` if a hub dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def katz_centrality(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 6,
    alpha_log2: int = 1,
    weight_col: str | None = None,
    n_salts: int | None = None,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Truncated Katz index over a directed simple graph (dedup edges first
    if multi-edges should not multiply influence). Returns
    ``(node_id, katz: double)`` for every node appearing as src or dst;
    α = 1/2^alpha_log2, K = iters terms. ``weight_col`` (INTEGER edge
    weights) scales each message by its edge's weight — integer products
    preserve the power-of-two divisibility, so weighted propagation stays
    bit-exact.

    ``n_salts``: hub-out-degree skew guard. The per-round SUM groupBy is
    already two-phase (Spark's hash aggregate partial-aggregates map-side,
    so a hot dst key ships ≤ one combined row per partition) — the residual
    skew sits in the JOIN: a hub src key concentrates all its out-edges in
    one co-partition, and because the edge side is pre-partitioned and
    persisted (deliberately — only ranks move per round), AQE's runtime
    skew-split never sees a shuffle to re-plan. With ``n_salts=k`` the
    edges carry a deterministic salt ``xxhash64(dst) % k`` (dst varies
    within a hub's edge list, so its edges spread across all k salts), the
    rank table replicates k× per round, and the join keys on (src, salt) —
    every join partition holds ≤ 1/k of a hub's edges. Output is
    bit-identical (same joined pairs, exact integer sums; parity pinned by
    the katz_salted_graph oracle twin). Replication costs k× the rank-table
    shuffle, so reserve it for genuinely Zipfian graphs.

    ``nodes``: optional (node_id) frame that MUST equal the edge endpoint
    set src∪dst as a SET (duplicates not allowed). When the caller can
    derive it from dimension tables (key columns of the source relations),
    that skips a distinct over 2×|E| rows — |E| ≫ |V| on real graphs, so
    the endpoint-distinct is a full extra pass over the edge list
    (optimization guide §2.4). Wrong input changes results; the oracle
    gate pins the contract."""
    if iters < 0 or alpha_log2 < 1:
        raise ValueError("iters must be >= 0 and alpha_log2 >= 1")
    scale = 1 << (alpha_log2 * iters)
    # pre-shuffle the (loop-invariant) edge table by the join key ONCE:
    # the persisted hash distribution satisfies every round's join
    # requirement, so only the (much smaller) rank table moves per round.
    wcol = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"), wcol.alias("w")
    )
    if n_salts:
        e = e.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col("dst")), F.lit(n_salts))
        ).repartition(F.col("src"), F.col("_salt"))
        join_keys = ["src", "_salt"]
    else:
        e = e.repartition(F.col("src"))
        join_keys = ["src"]
    e.persist()
    try:
        nodes = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
            if nodes is None
            else nodes.select("node_id")
        ).localCheckpoint(eager=True)
        # zero-contribution row per node folded into the aggregate: one
        # shuffle per round (the message sum) instead of sum + a second
        # nodes-left-join shuffle, with identical results (0 adds nothing,
        # but guarantees every node — in-edges or not — gets a rank row).
        zeros = nodes.withColumn("r", F.lit(0).cast("long"))
        ranks = nodes.withColumn("r", F.lit(scale).cast("long"))
        for _ in range(iters):
            r_side = ranks.withColumnRenamed("node_id", "src")
            if n_salts:
                r_side = r_side.withColumn(
                    "_salt",
                    F.explode(
                        F.sequence(
                            F.lit(0), F.lit(n_salts - 1)
                        ).cast("array<bigint>")
                    ),
                )
            msgs = e.join(r_side, join_keys).select(
                F.col("dst").alias("node_id"),
                (F.col("w") * F.col("r")).alias("r"),
            )
            ranks = (
                msgs.unionByName(zeros)
                .groupBy("node_id")
                .agg(
                    (
                        F.lit(scale)
                        + F.expr(f"sum(r) div {1 << alpha_log2}")
                    ).cast("long").alias("r")
                )
                # LAZY checkpoint: still truncates lineage (plans stay
                # round-sized) but materializes inside the NEXT round's job
                # instead of forcing one eager job per round — ranks has a
                # single consumer, so eagerness bought nothing (measured
                # ~6% at sf0.1; the real cost is the per-round shuffle,
                # which the algorithm needs)
                .localCheckpoint(eager=False)
            )
        return ranks.select(
            "node_id",
            (F.col("r").cast("double") / F.lit(float(scale))).alias("katz"),
        )
    finally:
        e.unpersist()


def personalized_katz(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node_id",
    iters: int = 4,
    alpha_log2: int = 1,
) -> DataFrame:
    """Seeded relevance propagation (personalized-PageRank analog in the
    Katz family): mass starts ONLY on the seed nodes and decays by 1/2^b
    per hop outward —

        r_0(v)     = [v ∈ seeds]
        r_{t+1}(v) = r_0(v) + α · Σ_{u→v} r_t(u)

    ranking the graph neighborhood of a seed set (retrieval seeding /
    entity-context scoring at whole-graph breadth). Same exact-BIGINT
    pre-scaling as `katz_centrality` — no division, engine- and
    partitioning-exact. Only nodes with nonzero mass appear in the output
    (frontier-sized, not graph-sized): (node_id, score: double)."""
    if iters < 0 or alpha_log2 < 1:
        raise ValueError("iters must be >= 0 and alpha_log2 >= 1")
    scale = 1 << (alpha_log2 * iters)
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .repartition(F.col("src"))
    )
    e.persist()
    try:
        base = (
            seeds.select(F.col(seed_col).alias("node_id"))
            .distinct()
            .select(
                "node_id",
                F.lit(0).cast("long").alias("m"),
                F.lit(scale).cast("long").alias("b"),
            )
            .localCheckpoint(eager=True)
        )
        ranks = base.select(
            "node_id", (F.col("m") + F.col("b")).alias("r")
        )
        for _ in range(iters):
            # two-field accumulator in ONE shuffle: message mass `m` gets
            # attenuated, seed restart mass `b` does not
            msgs = e.join(
                ranks.withColumnRenamed("node_id", "src"), "src"
            ).select(
                F.col("dst").alias("node_id"),
                F.col("r").alias("m"),
                F.lit(0).cast("long").alias("b"),
            )
            ranks = (
                msgs.unionByName(base)
                .groupBy("node_id")
                .agg(
                    (
                        F.sum("b")
                        + F.expr(f"sum(m) div {1 << alpha_log2}")
                    ).cast("long").alias("r")
                )
                # LAZY: same rationale as katz_centrality — single consumer
                # per round, so an eager per-round job buys nothing; lineage
                # still truncates to round size
                .localCheckpoint(eager=False)
            )
        return ranks.select(
            "node_id",
            (F.col("r").cast("double") / F.lit(float(scale))).alias("score"),
        )
    finally:
        e.unpersist()


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """k-core peeling, ``rounds`` synchronous rounds: repeatedly drop nodes
    whose degree (undirected, over surviving edges) is < k. Returns the
    surviving (node, degree) table — after enough rounds this IS the k-core
    (maximal subgraph with min degree ≥ k); a fixed round count keeps the
    spec deterministic and oracle-expressible (the oracle unrolls the same
    rounds), while callers can loop to a fixpoint by comparing counts.

    Scale shape (same discipline as `katz_centrality`): each round is one
    degree aggregate over the surviving edge list + two semi-joins to drop
    edges touching peeled nodes; the edge list only shrinks, and each
    round's result is localCheckpointed so the plan stays round-sized
    instead of growing a 2^rounds lineage."""
    e = edges.select(
        F.col(src_col).alias("a"), F.col(dst_col).alias("b")
    ).filter(F.col("a") != F.col("b"))
    e = e.localCheckpoint(eager=True)
    for _ in range(rounds):
        deg = (
            e.select(F.col("a").alias("node"))
            .unionByName(e.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        keep = deg.filter(F.col("degree") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
        ).localCheckpoint(eager=True)
    # the post-round degree table, unfiltered: at the fixpoint every degree
    # is >= k (the k-core); before it, callers see the raw peeling state
    return (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """Truncated PageRank (d = 0.85, unnormalized start r₀ = 1) over a
    directed simple graph — the canonical web-graph importance signal
    alongside the Katz family:

        r_{t+1}(v) = 0.15 + 0.85 · Σ_{(u,v)∈E} q(r_t(u) / outdeg(u))

    Dangling mass (nodes with no out-edges) is dropped, not redistributed
    — the "simple" variant; ranks are therefore comparable within a run,
    not a probability distribution.

    EXACTNESS (the hash-gate discipline): division by out-degree breaks
    Katz's pure-power-of-two trick, and quantizing the double quotient
    with ROUND(x, 6) is boundary-UNSAFE here — grid-valued ranks divided
    by small integers land exactly ON half-boundaries (1.234567/2 =
    .6172835), where the engines' double-rounding paths disagree. So the
    whole loop runs in SCALED INTEGERS on the 10⁻⁶ grid with FLOOR
    semantics: r₆ holds rank·10⁶ as BIGINT, a message is ``r₆ div deg``
    (exact integer floor), and the update is
    ``150000 + (85 · Σm) div 100`` — every op is integer, so scores are
    bit-identical in any engine and partitioning by construction. The
    systematic truncation error is < iters·10⁻⁶, far below any ranking
    use; the final ``r₆/10⁶`` is one exact-operand IEEE division.

    Scale shape = katz_centrality's: the (edge ⋈ outdeg) table is built
    once, repartitioned on the join key and persisted; only rank rows move
    per round; zero-contribution rows fold the no-in-edge nodes into the
    same single shuffle; lazy localCheckpoint keeps plans round-sized."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    from pyspark.sql.window import Window

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    # out-degree via a src-partitioned window instead of groupBy + re-join:
    # the old shape read the (possibly expensive) edge build TWICE — once
    # for the aggregate, once for the join's probe side — and shuffled e a
    # second time for the loop's repartition. The window's exchange IS a
    # hash partitioning on src, so one pass attaches deg and establishes
    # the loop partitioning together (guide §2.4 "window partitioned by
    # the same key as a preceding aggregation shares the exchange"); count
    # is integer-exact, so rows are identical to the join form.
    ed = e.withColumn(
        "deg", F.count(F.lit(1)).over(Window.partitionBy("src"))
    ).repartition(F.col("src"))
    ed.persist()
    try:
        # see katz_centrality's `nodes` contract (set equality required)
        nodes = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
            if nodes is None
            else nodes.select("node_id")
        ).localCheckpoint(eager=True)
        zeros = nodes.withColumn("m", F.lit(0).cast("long"))
        ranks = nodes.withColumn("r6", F.lit(1_000_000).cast("long"))
        for _ in range(iters):
            msgs = ed.join(
                ranks.withColumnRenamed("node_id", "src"), "src"
            ).select(
                F.col("dst").alias("node_id"),
                F.expr("r6 div deg").alias("m"),
            )
            ranks = (
                msgs.unionByName(zeros)
                .groupBy("node_id")
                .agg(
                    F.expr("150000 + (85 * sum(m)) div 100")
                    .cast("long")
                    .alias("r6")
                )
                .localCheckpoint(eager=False)
            )
        return ranks.select(
            "node_id",
            (F.col("r6").cast("double") / F.lit(1_000_000.0)).alias("pagerank"),
        )
    finally:
        ed.unpersist()


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 4,
    nodes: DataFrame | None = None,
) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg) over a directed simple graph —
    the link-analysis dual to `pagerank`: a node is a good AUTHORITY if
    good hubs point at it, a good HUB if it points at good authorities:

        a_t(v) = Σ_{(u,v)∈E} h_{t-1}(u)        (then normalize)
        h_t(u) = Σ_{(u,v)∈E} a_t(v)            (then normalize)

    Reference capability parity: graph-importance ranking next to Katz /
    PageRank (lexical-graph retrieval reranks statements by graph
    centrality); HITS adds the directional hub/authority split.

    EXACTNESS (hash-gate discipline): classic HITS L2-normalizes — a
    square root that can never cross the engine boundary. This variant
    normalizes by the MAX instead (rank order and ratio structure are
    preserved; max-normalized HITS is a standard formulation) and does it
    entirely in scaled integers: scores live on the 10⁻⁶ grid as BIGINT,
    and each half-round rescales by FLOOR division with the ceiling of
    max/10⁶ — ``s = raw div greatest(1, (max_raw + 999999) div 10⁶)`` —
    so the leader sits at ~10⁶ and every op is exact integer arithmetic,
    bit-identical in any engine and under any partitioning. Dividing by
    ceil(max/10⁶) instead of multiplying raw by 10⁶ first keeps every
    intermediate ≤ Σranks ≤ n·10⁶, overflow-safe to n ≈ 9·10¹² nodes.

    Scale shape (= `pagerank`): the edge list is deduped, repartitioned on
    each join key once and persisted; per round only (node, score) rows
    move — two key-partitioned joins + two aggregates; the per-round max
    is a broadcast one-row cross join (never a driver collect); lazy
    localCheckpoint keeps the plan round-sized instead of 2^iters deep.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    # lineage break after the dedup: e_by_src and e_by_dst each persist a
    # REPARTITION of e — without the checkpoint each persist's first
    # materialization re-runs the whole upstream edge build + distinct
    # (two full passes for one dedup; guide §2.4/§3.3). Lazy is safe: the
    # first half-round touches only e_by_src (materializing the
    # checkpoint); e_by_dst materializes a half-round later from blocks.
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    e_by_src = e.repartition(F.col("src")).persist()
    e_by_dst = e.repartition(F.col("dst")).persist()
    try:
        # see katz_centrality's `nodes` contract (set equality required)
        nodes = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
            if nodes is None
            else nodes.select("node_id")
        ).localCheckpoint(eager=True)
        zeros = nodes.withColumn("m", F.lit(0).cast("long"))

        def _half(scores: DataFrame, join_key: str, out_key: str) -> DataFrame:
            # one message pass: scores keyed by join_key flow to out_key,
            # then max-rescale onto the 10^-6 grid (all-BIGINT floor ops)
            edge = e_by_src if join_key == "src" else e_by_dst
            raw = (
                edge.join(scores.withColumnRenamed("node_id", join_key), join_key)
                .select(F.col(out_key).alias("node_id"), F.col("s6").alias("m"))
                .unionByName(zeros)
                .groupBy("node_id")
                .agg(F.sum("m").alias("raw"))
                # checkpoint RAW, not the rescale: the max branch and the
                # rescale branch both read it — without this each half-round
                # runs the join+aggregate twice
                .localCheckpoint(eager=False)
            )
            mx = raw.agg(F.max("raw").alias("mx"))
            return raw.crossJoin(F.broadcast(mx)).select(
                "node_id",
                F.expr(
                    "raw div greatest(1L, (mx + 999999) div 1000000)"
                ).cast("long").alias("s6"),
            )

        hubs = nodes.withColumn("s6", F.lit(1_000_000).cast("long"))
        auths = None
        for _ in range(iters):
            auths = _half(hubs, "src", "dst")
            hubs = _half(auths, "dst", "src")
        return (
            hubs.select("node_id", F.col("s6").alias("h6"))
            .join(auths.select("node_id", F.col("s6").alias("a6")), "node_id")
            .select(
                "node_id",
                (F.col("h6").cast("double") / F.lit(1_000_000.0)).alias("hub"),
                (F.col("a6").cast("double") / F.lit(1_000_000.0)).alias("authority"),
            )
        )
    finally:
        e_by_src.unpersist()
        e_by_dst.unpersist()


def modularity(
    edges: DataFrame,
    assignments: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node_id",
    comm_col: str = "community",
) -> DataFrame:
    """Newman modularity Q of a community assignment over an undirected
    simple graph — the standard "is this clustering real structure?"
    score for the partitions this engine produces (near-dup clusters,
    entity-resolution groups, label propagation):

        Q = Σ_c [ e_c/m − (d_c/2m)² ]

    with m the edge count, e_c the edges inside community c, d_c the
    degree sum of c. Q ≈ 0 ⇒ no better than random; Q ≳ 0.3 ⇒ strong
    structure.

    EXACTNESS: over the common denominator 4m² the whole score is ONE
    integer ratio — q_num = 4m·Σe_c − Σd_c², q_den = 4m² — so the
    emitted row is exact-BIGINT statistics plus a single exact-operand
    IEEE division (BIGINT holds to m ≈ 10⁹ edges; the documented escape
    beyond is DECIMAL(38,0) for the two products).

    Input contract: edges are canonicalized internally (self-loops
    dropped, (a,b)/(b,a)/duplicates collapse to one undirected edge);
    only edges with BOTH endpoints assigned count (inner join —
    unassigned nodes are outside the evaluated subgraph).

    Scale shape: two broadcast-or-shuffle equi-joins onto the assignment
    table, then three map-side-combined aggregates (per-community inside
    counts, per-community degree sums, one global reduce) cross-joined as
    one-row broadcasts — the edge list is scanned once."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    asg = assignments.select(
        F.col(node_col).alias("node"), F.col(comm_col).alias("c")
    )
    ea = (
        e.join(asg.withColumnsRenamed({"node": "a", "c": "ca"}), "a")
        .join(asg.withColumnsRenamed({"node": "b", "c": "cb"}), "b")
        .select("ca", "cb")
    )
    ea = ea.localCheckpoint(eager=False)  # three aggregates read it
    totals = ea.agg(F.count(F.lit(1)).alias("m"))
    inside = (
        ea.filter(F.col("ca") == F.col("cb"))
        .groupBy("ca")
        .agg(F.count(F.lit(1)).alias("e_c"))
        .agg(F.coalesce(F.sum("e_c"), F.lit(0)).cast("long").alias("sum_ec"))
    )
    degsq = (
        ea.select(F.col("ca").alias("c"))
        .unionByName(ea.select(F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).alias("d_c"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_communities"),
            F.coalesce(F.sum(F.col("d_c") * F.col("d_c")), F.lit(0))
            .cast("long")
            .alias("sum_dsq"),
        )
    )
    return (
        totals.crossJoin(F.broadcast(inside))
        .crossJoin(F.broadcast(degsq))
        .select(
            "m", "n_communities",
            (4 * F.col("m") * F.col("sum_ec") - F.col("sum_dsq")).alias("q_num"),
            (4 * F.col("m") * F.col("m")).alias("q_den"),
            F.when(
                F.col("m") > 0,
                (4 * F.col("m") * F.col("sum_ec") - F.col("sum_dsq")).cast("double")
                / (4 * F.col("m") * F.col("m")).cast("double"),
            ).alias("modularity"),
        )
    )


def degree_assortativity(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Degree assortativity coefficient (Newman 2002) of an undirected
    simple graph — the Pearson correlation of endpoint degrees over edges:
    positive = hubs attach to hubs (social nets), negative = hubs attach
    to leaves (tech/biological nets, and near-dup/boilerplate graphs). A
    one-row structural fingerprint complementing `modularity`.

    Each undirected edge contributes BOTH orientations (the standard
    symmetric estimator), so Σx = Σy and the formula reduces to

        r = (M·Σxy − (Σx)²) / (M·Σx² − (Σx)²)        with M = 2·|E|

    EXACTNESS: degrees and all five sufficient statistics are BIGINT; r
    is one exact-operand IEEE division (no sqrt needed in the symmetric
    form — the two variance legs are identical). NULL when the variance
    is zero (regular graphs: r is undefined).

    Scale shape: canonical edge dedup, one degree aggregate, two
    degree-table joins back onto edges (equi-joins on the endpoint), one
    global reduce with map-side combine. BIGINT-safe while M·Σ(d_u·d_v)
    < 2⁶³ — beyond ~10⁹ heavy-tailed edges switch the two products to
    DECIMAL(38,0)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=False)  # both degree legs + the ed join read it
    )
    deg = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=False)  # joined back on BOTH endpoints
    )
    ed = (
        e.join(deg.withColumnsRenamed({"n": "a", "d": "da"}), "a")
        .join(deg.withColumnsRenamed({"n": "b", "d": "db"}), "b")
    )
    agg = ed.agg(
        (2 * F.count(F.lit(1))).cast("long").alias("m"),
        F.sum(F.col("da") + F.col("db")).cast("long").alias("sx"),
        (2 * F.sum(F.col("da") * F.col("db"))).cast("long").alias("sxy"),
        F.sum(
            F.col("da") * F.col("da") + F.col("db") * F.col("db")
        ).cast("long").alias("sxx"),
    )
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sx")
    den = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    return agg.select(
        F.col("m"), F.col("sx"), F.col("sxy"), F.col("sxx"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "assortativity"
        ),
    )


def weighted_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight_col: str = "w",
    iters: int = 4,
) -> DataFrame:
    """Edge-weighted truncated PageRank — `pagerank` where a node's rank
    splits across out-edges in proportion to INTEGER edge weights (order
    multiplicity, click counts) instead of uniformly:

        r_{t+1}(v) = 0.15 + 0.85 · Σ_{(u,v,w)∈E} ⌊w · r_t(u) / W(u)⌋

    with W(u) the node's total out-weight. Same scaled-integer floor
    discipline as `pagerank` (r₆ = rank·10⁶ BIGINT; the per-edge message
    is ``(w · r6) div W`` — one integer multiply before the floor divide,
    so weighting adds NO new rounding surface) and the same dangling-mass
    drop. Weights must be positive integers; the systematic truncation
    error stays < iters·10⁻⁶ per edge chain.

    Scale shape identical to `pagerank`: (edge ⋈ out-weight) built once,
    repartitioned on src and persisted; only rank rows move per round."""
    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight_col).cast("long").alias("w"),
    )
    from pyspark.sql.window import Window

    # out-weight via a src-partitioned window — see pagerank: one pass
    # over the edge build instead of aggregate + re-join (two reads), and
    # the window's hash exchange doubles as the loop's src partitioning.
    ed = e.withColumn(
        "tw", F.sum("w").over(Window.partitionBy("src"))
    ).repartition(F.col("src"))
    ed.persist()
    try:
        nodes = (
            e.select(F.col("src").alias("node_id"))
            .unionByName(e.select(F.col("dst").alias("node_id")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        zeros = nodes.withColumn("m", F.lit(0).cast("long"))
        ranks = nodes.withColumn("r6", F.lit(1_000_000).cast("long"))
        for _ in range(iters):
            msgs = ed.join(
                ranks.withColumnRenamed("node_id", "src"), "src"
            ).select(
                F.col("dst").alias("node_id"),
                F.expr("(w * r6) div tw").alias("m"),
            )
            ranks = (
                msgs.unionByName(zeros)
                .groupBy("node_id")
                .agg(
                    F.expr("150000 + (85 * sum(m)) div 100")
                    .cast("long")
                    .alias("r6")
                )
                .localCheckpoint(eager=False)
            )
        return ranks.select(
            "node_id",
            (F.col("r6").cast("double") / F.lit(1_000_000.0)).alias("pagerank"),
        )
    finally:
        ed.unpersist()


def neighborhood_sizes(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    m: int = 64,
) -> DataFrame:
    """Per-node neighborhood-size estimation à la HyperBall (Boldi &
    Vigna 2013): every node keeps an m-register HyperLogLog of the nodes
    within radius r, and a round merges each node's registers with its
    neighbors' via (idx, max) — so |ball(v, 2)| for EVERY node costs two
    register-join rounds instead of per-node BFS (the algorithm behind
    "four degrees of separation"-scale neighborhood functions). Returns
    ``(node_id, est_1hop, est_2hop)`` — undirected balls including the
    node itself.

    EXACTNESS (the sketch is hash-gated, like `sketch.hll_estimate`):
    each node hashes ONCE (52-bit md5 → register idx + leading-zero
    rank, pure integer); register merging is (idx, max) groupBys; the
    per-node harmonic sum is ≤ m exact power-of-two doubles plus an
    exact integer zero-fill — exact in any accumulation order — and the
    linear-counting ln is quantized to the 6-decimal grid. Deterministic
    and engine-identical end to end.

    Scale shape: state is m small ints per node, EXACTLY HyperBall's
    design point; a round is one edge ⋈ register equi-join + one
    (node, idx) max aggregate — m× the edge list moves, independent of
    ball sizes (the exact-BFS alternative moves the balls themselves,
    which explode combinatorially). Deeper radii = repeat the merge."""
    from graphrag_toolkit_spark.operators.sketch import hll_idx_rank

    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    nodes = (
        e.select(F.col("a").alias("n"))
        .unionByName(e.select(F.col("b").alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    und = (
        e.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionByName(e.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .unionByName(nodes.select(F.col("n").alias("v"), F.col("n").alias("w")))
        .distinct()
    ).localCheckpoint(eager=False)
    whash = hll_idx_rank(nodes, "n", m=m, keep=["n"]).select(
        F.col("n").alias("w"), "idx", "rank"
    )
    r1 = (
        und.join(whash, "w")
        .groupBy(F.col("v"), F.col("idx"))
        .agg(F.max("rank").cast("int").alias("reg"))
        .localCheckpoint(eager=False)
    )
    r2 = (
        und.join(r1.withColumnRenamed("v", "w"), "w")
        .groupBy(F.col("v"), F.col("idx"))
        .agg(F.max("reg").cast("int").alias("reg"))
    )

    def _estimate(regs: DataFrame, out_col: str) -> DataFrame:
        alpha = 0.709  # α₆₄, shared literal with sketch.hll_estimate
        agg = regs.groupBy("v").agg(
            F.count(F.lit(1)).alias("np"),
            F.sum(
                F.lit(1.0)
                / F.expr("shiftleft(cast(1 as bigint), reg)").cast("double")
            ).alias("sp"),
        )
        s = (F.lit(m) - F.col("np")).cast("double") + F.col("sp")
        v0 = (F.lit(m) - F.col("np")).cast("long")
        raw = F.lit(alpha) * F.lit(float(m * m)) / s
        lin = F.round(
            F.lit(float(m)) * F.log(F.lit(float(m)) / v0.cast("double")), 6
        )
        return agg.select(
            "v",
            F.when((raw <= 2.5 * m) & (v0 > 0), lin).otherwise(raw).alias(out_col),
        )

    return (
        _estimate(r1, "est_1hop")
        .join(_estimate(r2, "est_2hop"), "v")
        .select(F.col("v").alias("node_id"), "est_1hop", "est_2hop")
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan et al.
    2007) made DETERMINISTIC: every node starts labeled with itself; each
    round it adopts the most frequent label among its neighbors, ties
    broken by MINIMUM label (classic LPA breaks ties randomly — this
    variant is reproducible across runs, engines, and partitionings,
    which is what lets it hash-gate). Fixed ``iters`` rounds keep the
    spec oracle-expressible; isolated rounds converge fast on
    community-structured graphs, and `modularity` scores the result.
    Returns ``(node_id, label)``; undirected, deduped edges.

    Scale shape: a round is one edge ⋈ label equi-join + one
    (node, label) count + one per-node window argmax — the same
    message-passing class as `pagerank`; labels are the only moving
    rows. localCheckpoint per round keeps plans round-sized."""
    from pyspark.sql.window import Window as W

    if iters < 0:
        raise ValueError("iters must be >= 0")
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = (
        e.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionByName(e.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col("v").alias("node_id")).distinct().localCheckpoint(
        eager=True
    )
    labels = nodes.withColumn("label", F.col("node_id"))
    w_rank = W.partitionBy("v").orderBy(F.desc("n"), F.asc("label"))
    for _ in range(iters):
        votes = (
            und.join(labels.withColumnRenamed("node_id", "w"), "w")
            .groupBy(F.col("v"), F.col("label"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        best = (
            votes.withColumn("_rn", F.row_number().over(w_rank))
            .filter(F.col("_rn") == 1)
            .select(F.col("v").alias("node_id"), "label")
        )
        # isolated nodes (none here — every node has an edge — but the
        # contract survives filtered inputs): keep the previous label
        labels = (
            nodes.join(best, "node_id", "left")
            .select(
                "node_id", F.coalesce("label", F.col("node_id")).alias("label")
            )
            .localCheckpoint(eager=False)
        )
    return labels


def ktruss_peel(
    edges: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 2,
) -> DataFrame:
    """k-truss peeling (Cohen 2008) — the EDGE analog of `kcore_peel`: a
    k-truss is the maximal subgraph where every edge sits in ≥ k−2
    triangles, a far stronger cohesion filter than degree (k-core keeps
    hub-and-spoke noise; k-truss demands triangle support — the standard
    dense-community prefilter). Synchronous peel: each round computes
    every surviving edge's triangle support and drops edges below k−2; a
    fixed ``rounds`` count keeps it deterministic and oracle-expressible
    (callers loop to a fixpoint by comparing counts). Returns the
    surviving canonical edges with their CURRENT support
    ``(a, b, support)`` — at the fixpoint that IS the k-truss.

    Scale shape: support = one wedge join (edge ⋈ adjacency on the lower
    endpoint) semi-joined back against the edge set — the exact
    triangle-enumeration shape `triangle_count` uses, Σ deg(a) work per
    round, never |V|² — and the edge list only shrinks; each round's
    survivors are localCheckpointed."""
    if k < 2:
        raise ValueError("k must be >= 2")
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sup_df = None
    for _ in range(rounds):
        und = e.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
            e.select(F.col("b").alias("v"), F.col("a").alias("w"))
        )
        wedges = (
            e.join(und.withColumnsRenamed({"v": "a", "w": "x"}), "a")
            .filter(F.col("x") != F.col("b"))
        )
        closed = wedges.join(
            und.withColumnsRenamed({"v": "b", "w": "x"}), ["b", "x"], "left_semi"
        )
        sup_df = (
            e.join(
                closed.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support")),
                ["a", "b"],
                "left",
            )
            .select(
                "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
            )
        )
        e = (
            sup_df.filter(F.col("support") >= k - 2)
            .select("a", "b")
            .localCheckpoint(eager=True)
        )
    # final support of the SURVIVING edges (post-peel state)
    und = e.select(F.col("a").alias("v"), F.col("b").alias("w")).unionByName(
        e.select(F.col("b").alias("v"), F.col("a").alias("w"))
    )
    wedges = (
        e.join(und.withColumnsRenamed({"v": "a", "w": "x"}), "a")
        .filter(F.col("x") != F.col("b"))
    )
    closed = wedges.join(
        und.withColumnsRenamed({"v": "b", "w": "x"}), ["b", "x"], "left_semi"
    )
    return e.join(
        closed.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support")),
        ["a", "b"],
        "left",
    ).select(
        "a", "b", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )


def conductance(
    edges: DataFrame,
    assignments: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node_id",
    comm_col: str = "community",
) -> DataFrame:
    """Per-community conductance φ(S) over an undirected simple graph —
    the community-quality dual of `modularity` (which scores the whole
    partition): for each community S,

        φ(S) = cut(S) / min(vol(S), vol(V\\S))

    with cut(S) the edges crossing the boundary and vol(S) the degree sum
    inside S. Low φ ⇒ a well-separated community; φ near 1 ⇒ the "community"
    leaks most of its edges. The per-community view localizes what
    modularity's one global Q cannot: WHICH clusters are real.

    EXACTNESS: cut and vol are exact BIGINT counts; the score is a single
    exact-operand IEEE division. EVERY community in the assignment table
    is emitted: one with no incident (both-endpoints-assigned) edge gets
    vol=0, cut=0, conductance NULL — undefined, not silently absent.

    Input contract: same as `modularity` — edges canonicalized internally,
    only edges with both endpoints assigned count.

    Scale shape: two equi-joins onto the assignment table, then two
    map-side-combined per-community aggregates; the total volume is a
    one-row broadcast (2m — derived, never a second scan)."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    asg = assignments.select(
        F.col(node_col).alias("node"), F.col(comm_col).alias("c")
    )
    ea = (
        e.join(asg.withColumnsRenamed({"node": "a", "c": "ca"}), "a")
        .join(asg.withColumnsRenamed({"node": "b", "c": "cb"}), "b")
        .select("ca", "cb")
        .localCheckpoint(eager=False)  # volume + cut legs both read it
    )
    # vol(S): each endpoint contributes 1 per incident edge.
    vol = (
        ea.select(F.col("ca").alias("c"))
        .unionByName(ea.select(F.col("cb").alias("c")))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("vol"))
    )
    cut = (
        ea.filter(F.col("ca") != F.col("cb"))
        .select(F.explode(F.array("ca", "cb")).alias("c"))
        .groupBy("c")
        .agg(F.count(F.lit(1)).cast("long").alias("cut"))
    )
    total = ea.agg((F.count(F.lit(1)) * 2).cast("long").alias("vol_total"))
    comp = F.least(F.col("vol"), F.col("vol_total") - F.col("vol"))
    comms = asg.select("c").distinct()
    return (
        comms.join(vol, "c", "left")
        .withColumn("vol", F.coalesce("vol", F.lit(0)).cast("long"))
        .join(cut, "c", "left")
        .crossJoin(F.broadcast(total))
        .select(
            F.col("c").alias("community"),
            "vol",
            F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
            F.when(
                comp > 0,
                F.coalesce("cut", F.lit(0)).cast("double") / comp.cast("double"),
            ).alias("conductance"),
        )
    )


def harmonic_2hop(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Bounded-radius harmonic centrality over an undirected simple graph:

        H₂(u) = Σ_{d(u,v)=1} 1 + Σ_{d(u,v)=2} 1/2

    — the distance-discounted reach signal (Boldi–Vigna's harmonic
    centrality truncated at radius 2, the radius where the score is still
    an exact join computation rather than an all-pairs BFS). Complements
    `neighborhood_sizes` (HLL ball-size ESTIMATES) with exact counts and
    the 1/d weighting.

    EXACTNESS: counts are exact BIGINT; the half-weight is folded as
    score2 = 2·n1 + n2 (integer) and the final H₂ = score2 / 2 is one
    IEEE division by a POWER OF TWO — exact in binary, bit-identical in
    any engine.

    Scale shape: symmetric adjacency built once and reused for both hops;
    the 2-hop frontier is one self-join keyed on the middle node (work ∝
    Σ_v deg(v)² — wedge count, the same budget every triangle/clustering
    op on this graph already pays) followed by a distinct and an anti-join
    to drop distance-1 pairs."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = (
        e.select(F.col("a").alias("v"), F.col("b").alias("w"))
        .unionByName(e.select(F.col("b").alias("v"), F.col("a").alias("w")))
        .localCheckpoint(eager=False)  # both hops + the anti-join read it
    )
    n1 = und.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    two = (
        und.withColumnsRenamed({"v": "u", "w": "mid"})
        .join(und.withColumnsRenamed({"v": "mid", "w": "t"}), "mid")
        .filter(F.col("u") != F.col("t"))
        .select("u", "t")
        .distinct()
        .join(
            und.withColumnsRenamed({"v": "u", "w": "t"}),
            ["u", "t"],
            "left_anti",
        )
        .groupBy("u")
        .agg(F.count(F.lit(1)).cast("long").alias("n2"))
    )
    return (
        n1.join(two.withColumnsRenamed({"u": "v"}), "v", "left")
        .select(
            F.col("v").alias("node_id"),
            "n1",
            F.coalesce("n2", F.lit(0)).cast("long").alias("n2"),
            (
                (2 * F.col("n1") + F.coalesce("n2", F.lit(0))).cast("double")
                / F.lit(2.0)
            ).alias("harmonic_2hop"),
        )
    )
