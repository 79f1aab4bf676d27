"""Entity linking: fuzzy string and dense embedding (SURVEY §2.3 J16-J17).

Parity targets:
- J16 fuzzy linking: ``byokg-rag/.../indexing/fuzzy_string.py:22-72`` +
  ``graph_retrievers/entity_linker.py:56-113`` (thefuzz top-k with a length
  guard). Re-expressed as: length-bucket blocking → broadcast query × block
  join → JVM ``levenshtein`` similarity → window top-k. The blocking keeps
  the candidate join linear in catalog size at scale (no full cross-join).
- J17 dense linking: ``byokg-rag/.../indexing/dense_index.py:31-145`` (FAISS
  top-k) → broadcast-query brute-force cosine + window top-k; the ANN path
  for big catalogs is ``operators/ann.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from graphrag_toolkit_spark.functions.text import search_string
from graphrag_toolkit_spark.functions.vector import (
    cosine_similarity,
    cosine_similarity_quantized,
)


def token_set_similarity(a: Column, b: Column) -> Column:
    """thefuzz ``token_set_ratio`` semantics as JVM expressions (reference
    ``byokg-rag/.../indexing/fuzzy_string.py:22-72`` uses WRatio/token-set
    scoring): tokenize both normalized strings into sorted distinct sets,
    build the three canonical strings

        s0 = sorted intersection
        s1 = s0 + sorted(a \\ b)
        s2 = s0 + sorted(b \\ a)

    and return the max pairwise ratio, where ratio(x, y) =
    (|x|+|y|-lev(x,y)) / (|x|+|y|). Word-order-insensitive: 'barack obama'
    vs 'obama, barack' scores 1.0 (plain Levenshtein gives ~0.5). Scores in
    [0, 1]; both-empty pairs score 0 like thefuzz."""
    def toks(c: Column) -> Column:
        return F.array_sort(
            F.array_distinct(F.filter(F.split(c, " "), lambda t: t != ""))
        )

    ta, tb = toks(a), toks(b)
    inter = F.array_intersect(ta, tb)       # sorted: follows ta's order
    s0 = F.concat_ws(" ", inter)
    s1 = F.concat_ws(" ", F.concat(inter, F.array_except(ta, tb)))
    s2 = F.concat_ws(" ", F.concat(inter, F.array_except(tb, ta)))

    def ratio(x: Column, y: Column) -> Column:
        tot = F.length(x) + F.length(y)
        return F.when(tot == 0, F.lit(0.0)).otherwise(
            (tot - F.levenshtein(x, y)) / tot
        )

    return F.greatest(ratio(s0, s1), ratio(s0, s2), ratio(s1, s2))


def fuzzy_link(
    queries: DataFrame,            # (query,)
    names: DataFrame,              # (node_id, name)
    top_k: int = 3,
    length_slack: float = 0.5,
    min_score: float = 0.0,
    bucket_width: int = 8,
    scorer: str = "levenshtein",
) -> DataFrame:
    """J16: top-k catalog names per query by normalized Levenshtein
    similarity ``1 - dist/max(len)``, with the reference's length guard
    (candidates whose length differs more than ``length_slack × query_len``
    are skipped before the distance computation).
    Returns (query, node_id, name, fuzzy_score, rank).

    ``scorer``: 'levenshtein' (default, the entity_linker.py:56-113 length-
    guarded edit similarity) or 'token_set' (``token_set_similarity`` —
    thefuzz's word-order-insensitive WRatio leg, fuzzy_string.py:22-72).

    Blocking: the length guard is an interval predicate, which as a raw
    theta-join degenerates to a nested-loop scan of the whole catalog per
    query row. Instead the catalog is bucketed on ``floor(len /
    bucket_width)`` and each query explodes to the bucket RANGE covering its
    slack interval (``⌊len(1-s)/w⌋ … ⌊len(1+s)/w⌋`` — floor is monotone, so
    every candidate the guard admits lands in one of those buckets). The
    join is then a hash equi-join on bucket — linear in catalog size, with
    ~``len·2s/w`` probe duplicates per query — and the exact guard re-applied
    after it keeps results identical to the theta form. No broadcast hint:
    AQE broadcasts seed-sized query sets and shuffle-joins corpus-sized
    mention sets on bucket."""
    q = (
        queries.select(
            F.col("query"), search_string(F.col("query")).alias("qnorm")
        ).withColumn("qlen", F.length("qnorm")).distinct()
    )
    probes = q.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("qlen") * (1.0 - length_slack) / bucket_width),
                F.floor(F.col("qlen") * (1.0 + length_slack) / bucket_width),
            )
        ),
    )
    c = (
        names.select(
            "node_id", "name", search_string(F.col("name")).alias("cnorm")
        )
        .withColumn("clen", F.length("cnorm"))
        .withColumn("bucket", F.floor(F.col("clen") / bucket_width))
    )

    guard = (
        (F.col("clen") >= F.col("qlen") * (1.0 - length_slack))
        & (F.col("clen") <= F.col("qlen") * (1.0 + length_slack))
    )
    if scorer == "levenshtein":
        # both-empty pairs score 0 like thefuzz's ratio('','') — and the
        # guard is the only reason the pair exists (qlen=0 → slack interval
        # [0,0]); without the WHEN, ANSI mode turns the 0/0 into a runtime
        # DIVIDE_BY_ZERO that kills the whole job on one degenerate row
        dist = F.levenshtein(F.col("qnorm"), F.col("cnorm"))
        denom = F.greatest(F.col("qlen"), F.col("clen"))
        score = F.when(denom > 0, 1.0 - dist / denom).otherwise(F.lit(0.0))
    elif scorer == "token_set":
        score = token_set_similarity(F.col("qnorm"), F.col("cnorm"))
    else:
        raise ValueError(
            f"unknown scorer {scorer!r}: expected levenshtein or token_set"
        )
    scored = (
        c.join(probes, "bucket")
        .filter(guard)
        .withColumn("fuzzy_score", score)
        .filter(F.col("fuzzy_score") >= min_score)
    )
    w = Window.partitionBy("query").orderBy(F.desc("fuzzy_score"), F.asc("node_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query", "node_id", "name", "fuzzy_score", "rank")
    )


def dense_link(
    queries: DataFrame,            # (query_id, embedding)
    catalog: DataFrame,            # (node_id, embedding)
    top_k: int = 3,
    quantized: bool = False,
) -> DataFrame:
    """J17: top-k catalog entries per query embedding by exact cosine.
    Queries are broadcast (few); the catalog scan is map-side only until the
    final per-query top-k window. Returns (query_id, node_id, score, rank)."""
    q = F.broadcast(
        queries.select("query_id", F.col("embedding").alias("q_embedding"))
    )
    fn = cosine_similarity_quantized if quantized else cosine_similarity
    scored = catalog.crossJoin(q).withColumn(
        "score", fn(F.col("embedding"), F.col("q_embedding"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("node_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "node_id", "score", "rank")
    )
