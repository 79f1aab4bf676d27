"""Edit-distance-1 string pairing via deletion-neighborhood blocking
(SymSpell / FastSS family — Bocek et al. 2007, "Fast Similarity Search in
Large Dictionaries").

North-star data-cleaning op: typo detection / variant merging over a corpus
vocabulary (the reference's fuzzy entity linking, `operators/linking.py`,
matches queries against a dictionary; this op finds the intra-dictionary
near-identical pairs themselves — the table you'd use to canonicalize
spelling variants before linking).

Scale shape: each word of length L expands to L+1 deletion variants (itself
plus one-char deletions); two words are within Levenshtein distance 1 iff
they share a variant, so candidate generation is a plain EQUI-JOIN on the
variant string — never a quadratic cross product, never a theta-join. The
exact `levenshtein` verify runs only on candidates. At 100 TB the variant
table shuffles on its (short-string) key like any hash join; hot variants
(e.g. very common short words) are ordinary agg skew, handled by AQE.

Exactness: Levenshtein distance is integer and implemented identically in
Spark (`F.levenshtein`) and DuckDB (`levenshtein`) — oracle-exact for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(word: Column) -> Column:
    """``w`` plus every one-character deletion of ``w`` as an array.
    Levenshtein(a, b) <= 1 ⟺ variants(a) ∩ variants(b) ≠ ∅:
    substitution at i ⇒ both sides share the delete-at-i string; an
    insert/delete pair shares the shorter word itself."""
    return F.array_union(
        F.array(word),
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.concat(
                F.substring(word, F.lit(1), i - 1),
                word.substr(i + 1, F.length(word)),
            ),
        ),
    )


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    min_len: int = 4,
    max_len: int = 12,
) -> DataFrame:
    """All distinct value pairs of ``str_col`` at Levenshtein distance
    EXACTLY 1: deletion-neighborhood equi-join for candidates, exact
    levenshtein verify. Returns (word_a, word_b) with word_a < word_b.
    Length bounds keep the variant fan-out per word constant and drop
    noise tokens (very short words pair with everything)."""
    words = (
        df.select(F.col(str_col).alias("w"))
        .filter(F.length("w").between(min_len, max_len))
        .distinct()
        # both sides of the variant self-join explode THIS frame — without
        # a lineage break each side re-runs the scan+filter+distinct
        # (guide §3.3). EAGER because the two join sides materialize
        # concurrently; the in-row variant explode stays per-side (10× the
        # rows — cheaper to recompute than to store and reread).
        .localCheckpoint(eager=True)
    )
    v = words.select(
        "w", F.explode(deletion_variants(F.col("w"))).alias("variant")
    )
    a = v.select(F.col("w").alias("word_a"), "variant")
    b = v.select(F.col("w").alias("word_b"), "variant")
    return (
        a.join(b, "variant")
        .filter(F.col("word_a") < F.col("word_b"))
        .select("word_a", "word_b")
        # verify BEFORE the dedup exchange: shared variants duplicate only
        # a few % of candidate pairs, so the distinct previously shuffled
        # ~4× the rows the verify keeps — the exact filter is narrow,
        # per-row, and cuts the exchange to survivors (guide §2.3)
        .filter(F.levenshtein("word_a", "word_b") == 1)
        .distinct()
    )
