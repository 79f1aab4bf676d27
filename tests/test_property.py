"""Property-based tests (hypothesis), mirroring the reference's test strategy
(SURVEY §5.2: hash utils, filter translation, reader framing get ≥100-example
property suites there). Spark jobs are expensive, so each property batches
ALL generated examples into ONE DataFrame per run and keeps max_examples low
— the per-example space is still explored by hypothesis shrinking."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from graphrag_toolkit_spark import ids
from graphrag_toolkit_spark.filters import (
    Condition,
    MetadataFilter,
    MetadataFilters,
    Op,
    to_column,
    to_sql,
)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

text_st = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
    min_size=0, max_size=40,
)


class TestContentIds:
    @given(st.lists(st.tuples(text_st, text_st), min_size=1, max_size=20))
    @settings(**SETTINGS)
    def test_source_id_matches_hashlib_and_shape(self, spark, pairs):
        df = spark.createDataFrame(
            [{"i": i, "text": t, "meta": m} for i, (t, m) in enumerate(pairs)]
        )
        got = {
            r["i"]: r["sid"]
            for r in df.select(
                "i", ids.source_id(F.col("text"), F.col("meta")).alias("sid")
            ).collect()
        }
        for i, (t, m) in enumerate(pairs):
            want = (
                "aws::"
                + hashlib.md5(t.encode()).hexdigest()[:8]
                + ":"
                + hashlib.md5(m.encode()).hexdigest()[:4]
            )
            assert got[i] == want

    @given(st.lists(st.tuples(text_st, text_st), min_size=2, max_size=20))
    @settings(**SETTINGS)
    def test_node_id_injective_on_separator(self, spark, pairs):
        # (a, bc) and (ab, c) must hash differently: the joiner is load-bearing
        df = spark.createDataFrame([{"v1": a, "v2": b} for a, b in pairs])
        out = df.select(
            "v1", "v2", ids.node_id("t", F.col("v1"), F.col("v2")).alias("nid")
        ).collect()
        by_pair = {(r["v1"], r["v2"]): r["nid"] for r in out}
        for (a, b), nid in by_pair.items():
            want = hashlib.md5(f"t::{a}::{b}".encode()).hexdigest()
            assert nid == want


# filter trees: leaves over an int column 'a' and a string column 's'
_leaf = st.one_of(
    st.builds(
        MetadataFilter,
        key=st.just("a"),
        operator=st.sampled_from([Op.EQ, Op.NE, Op.GT, Op.GTE, Op.LT, Op.LTE]),
        value=st.integers(min_value=-5, max_value=5),
    ),
    st.builds(
        MetadataFilter,
        key=st.just("s"),
        operator=st.sampled_from(
            [Op.EQ, Op.TEXT_MATCH, Op.TEXT_MATCH_INSENSITIVE, Op.STARTS_WITH, Op.IS_EMPTY]
        ),
        value=st.text(alphabet="abcXY", min_size=0, max_size=3),
    ),
)


def _tree(depth: int):
    if depth == 0:
        return _leaf
    sub = _tree(depth - 1)
    return st.one_of(
        _leaf,
        st.builds(
            MetadataFilters,
            filters=st.lists(sub, min_size=1, max_size=3),
            condition=st.sampled_from([Condition.AND, Condition.OR]),
        ),
        st.builds(
            MetadataFilters,
            filters=st.lists(sub, min_size=1, max_size=1),
            condition=st.just(Condition.NOT),
        ),
    )


ROWS = [
    {"rid": i, "a": a, "s": s}
    for i, (a, s) in enumerate(
        (a, s)
        for a in range(-3, 4)
        for s in ["", "abc", "ABC", "aXc", "cab", "abcabc"]
    )
]


class TestFilterTreeCrossEngine:
    @given(_tree(2))
    @settings(**SETTINGS)
    def test_column_and_sql_agree_with_duckdb(self, spark, tree):
        # P1 parity: the SAME tree compiled two ways (Catalyst Column, ANSI
        # SQL string) selects the same rows on Spark AND on DuckDB.
        sdf = spark.createDataFrame(ROWS)
        got_col = {r["rid"] for r in sdf.filter(to_column(tree)).collect()}
        sql = to_sql(tree)
        got_spark_sql = {
            r["rid"]
            for r in sdf.filter(F.expr(sql.replace('"', "`"))).collect()
        } if '"' in sql else {
            r["rid"] for r in sdf.filter(F.expr(sql)).collect()
        }

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t AS SELECT * FROM (VALUES "
            + ", ".join(f"({r['rid']}, {r['a']}, '{r['s']}')" for r in ROWS)
            + ") v(rid, a, s)"
        )
        got_duck = {
            r[0] for r in con.execute(f"SELECT rid FROM t WHERE {sql}").fetchall()
        }
        assert got_col == got_duck
        assert got_spark_sql == got_duck


class TestConnectedComponentsProperty:
    @given(
        st.lists(
            st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
                lambda p: p[0] != p[1]
            ),
            min_size=1,
            max_size=25,
        )
    )
    @settings(**SETTINGS)
    def test_matches_union_find(self, spark, edges):
        from graphrag_toolkit_spark.operators import dedup

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        want = {n: min(m for m in parent if find(m) == find(n)) for n in parent}

        pairs = spark.createDataFrame(
            [{"id_a": a, "id_b": b} for a, b in edges]
        )
        got = {
            r["id"]: r["component"]
            for r in dedup.connected_components(pairs).collect()
        }
        assert got == want


class TestSamplingProperty:
    @given(st.lists(st.integers(0, 10**9), min_size=1, max_size=60, unique=True))
    @settings(**SETTINGS)
    def test_split_matches_hashlib_and_is_total(self, spark, doc_ids):
        from graphrag_toolkit_spark.operators import sampling

        df = spark.createDataFrame([{"doc_id": i} for i in doc_ids])
        got = {
            r["doc_id"]: r["split"]
            for r in sampling.train_val_test_split(df, "doc_id").collect()
        }
        assert set(got) == set(doc_ids)
        for i in doc_ids:
            b = int(hashlib.md5(str(i).encode()).hexdigest()[:7], 16) % 10_000
            want = "test" if b < 1000 else ("val" if b < 2000 else "train")
            assert got[i] == want


class TestNlpKeywordTwins:
    """The driver-side and column-expression nlp keyword extractors must be
    the SAME function — retrieval seeds (python twin) and corpus extraction
    (column) silently diverging would poison the provider matrix."""

    @given(
        st.lists(
            st.text(
                alphabet=st.characters(
                    whitelist_categories=["Lu", "Ll", "Nd", "Zs"],
                    whitelist_characters=" .,?!-",
                ),
                max_size=120,
            ),
            min_size=1,
            max_size=8,
        )
    )
    @settings(**SETTINGS)
    def test_python_twin_equals_column(self, spark, texts):
        from graphrag_toolkit_spark import keywords

        df = spark.createDataFrame(
            [{"id": i, "text": t} for i, t in enumerate(texts)]
        )
        rows = keywords.nlp_keywords(df, "text", "id").collect()
        by_id: dict[int, list[str]] = {}
        for r in sorted(rows, key=lambda r: (r["id"], r["pos"])):
            by_id.setdefault(r["id"], []).append(r["keyword"])
        for i, t in enumerate(texts):
            assert by_id.get(i, []) == keywords.nlp_keywords_py(t)


class TestTokenSetProperty:
    """token_set_similarity against a direct Python reimplementation of
    thefuzz token_set_ratio (set split, three canonical strings, max of
    pairwise Levenshtein ratios)."""

    @staticmethod
    def _py_token_set(a: str, b: str) -> float:
        def lev(x: str, y: str) -> int:
            prev = list(range(len(y) + 1))
            for i, cx in enumerate(x, 1):
                cur = [i]
                for j, cy in enumerate(y, 1):
                    cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (cx != cy)))
                prev = cur
            return prev[-1]

        def ratio(x: str, y: str) -> float:
            tot = len(x) + len(y)
            return 0.0 if tot == 0 else (tot - lev(x, y)) / tot

        ta = sorted(set(t for t in a.split(" ") if t))
        tb = sorted(set(t for t in b.split(" ") if t))
        inter = [t for t in ta if t in tb]
        s0 = " ".join(inter)
        s1 = " ".join(inter + [t for t in ta if t not in tb])
        s2 = " ".join(inter + [t for t in tb if t not in ta])
        return max(ratio(s0, s1), ratio(s0, s2), ratio(s1, s2))

    @given(
        st.lists(
            st.tuples(
                st.text(alphabet="ab c", max_size=24),
                st.text(alphabet="ab c", max_size=24),
            ),
            min_size=1,
            max_size=12,
        )
    )
    @settings(**SETTINGS)
    def test_matches_python_reference(self, spark, pairs):
        from graphrag_toolkit_spark.operators.linking import token_set_similarity

        df = spark.createDataFrame(
            [{"i": i, "a": a, "b": b} for i, (a, b) in enumerate(pairs)]
        )
        got = {
            r["i"]: r["s"]
            for r in df.select(
                "i", token_set_similarity(F.col("a"), F.col("b")).alias("s")
            ).collect()
        }
        for i, (a, b) in enumerate(pairs):
            assert got[i] == pytest.approx(self._py_token_set(a, b), abs=1e-12)


class TestSpanDedupProperties:
    """Exact-substring dedup vs a direct Python reference: random small-vocab
    corpora (high n-gram collision rate by construction), whole corpus in one
    DataFrame per example."""

    @staticmethod
    def _py_reference(texts: dict[int, str], n: int):
        """Golden: per-doc duplicated starts/coverage and the scrubbed text
        with the global-first occurrence kept."""
        grams: dict[tuple, list[tuple[int, int]]] = {}
        toks = {i: t.lower().split(" ") for i, t in texts.items()}
        for i in sorted(toks):
            ts = toks[i]
            for p in range(len(ts) - n + 1):
                grams.setdefault(tuple(ts[p : p + n]), []).append((i, p))
        dup = {g: occ for g, occ in grams.items() if len({i for i, _ in occ}) >= 2}
        cov, scrub = {}, {}
        for i in sorted(toks):
            starts = sorted(p for g, occ in dup.items() for d, p in occ if d == i)
            covered = set()
            for p in starts:
                covered.update(range(p, p + n))
            removed = set()
            for g, occ in dup.items():
                first = min(occ)
                for d, p in occ:
                    if d == i and (d, p) != first:
                        removed.update(range(p, p + n))
            cov[i] = (len(starts), len(covered))
            scrub[i] = " ".join(
                t for p, t in enumerate(toks[i]) if p not in removed
            )
        return cov, scrub

    @given(
        st.lists(
            st.lists(
                st.sampled_from("a b c d".split()), min_size=1, max_size=12
            ).map(" ".join),
            min_size=2, max_size=8,
        )
    )
    @settings(**SETTINGS)
    def test_coverage_and_scrub_match_python(self, spark, texts_list):
        from graphrag_toolkit_spark.operators import spans

        n = 3
        texts = {i: t for i, t in enumerate(texts_list)}
        df = spark.createDataFrame(
            [{"doc_id": i, "text": t} for i, t in texts.items()]
        )
        want_cov, want_scrub = self._py_reference(texts, n)

        got_cov = {
            r["id"]: (r["dup_starts"], r["covered_tokens"])
            for r in spans.duplicated_span_coverage(df, "text", "doc_id", n=n).collect()
        }
        assert got_cov == want_cov

        got_scrub = {
            r["id"]: r["text_scrubbed"]
            for r in spans.scrub_duplicated_spans(df, "text", "doc_id", n=n).collect()
        }
        assert got_scrub == want_scrub


def _py_levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEditDistanceBlockingProperty:
    @given(
        st.lists(
            st.text(alphabet="abc", min_size=4, max_size=7),
            min_size=2, max_size=25, unique=True,
        )
    )
    @settings(**SETTINGS)
    def test_blocking_equals_brute_force(self, spark, words):
        """Deletion-neighborhood candidates recover EXACTLY the brute-force
        Levenshtein-1 pair set on random small-alphabet words (small
        alphabet → dense collisions → the hard case for completeness)."""
        from graphrag_toolkit_spark.operators.editdist import edit_distance_pairs

        df = spark.createDataFrame([{"w": w} for w in words])
        fast = set(
            map(tuple, edit_distance_pairs(df, "w", min_len=4, max_len=7).collect())
        )
        brute = {
            (a, b)
            for a in words
            for b in words
            if a < b and _py_levenshtein(a, b) == 1
        }
        assert fast == brute


class TestAucProperty:
    @given(
        st.lists(
            st.tuples(st.integers(0, 5), st.booleans()),
            min_size=2, max_size=40,
        ).filter(lambda xs: len({y for _, y in xs}) == 2)
    )
    @settings(**SETTINGS)
    def test_auc_equals_pairwise_definition(self, spark, rows):
        """binary_auc (rank-statistic form) equals the O(P·N) pairwise
        definition (wins + half-ties) on random tied integer scores."""
        from graphrag_toolkit_spark.operators.ranking_eval import binary_auc

        df = spark.createDataFrame(
            [{"s": float(sc), "y": y} for sc, y in rows]
        )
        got = binary_auc(df, "s", "y").head()["auc"]
        pos = [s for s, y in rows if y]
        neg = [s for s, y in rows if not y]
        wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
        assert got == pytest.approx(wins / (len(pos) * len(neg)))


class TestContainmentProperty:
    @given(
        st.lists(
            st.lists(st.sampled_from("abcdefgh"), min_size=2, max_size=8),
            min_size=2, max_size=6,
        )
    )
    @settings(**SETTINGS)
    def test_containment_matches_set_definition(self, spark, docs_toks):
        """containment_pairs over word-unigram shingles equals the plain
        set definition |A∩B|/|A| on random token lists (all pairs with
        shared tokens, both directions, asymmetric)."""
        from graphrag_toolkit_spark.operators import dedup

        rows = [
            {"doc_id": i, "text": " ".join(toks)}
            for i, toks in enumerate(docs_toks)
        ]
        df = spark.createDataFrame(rows)
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in dedup.containment_pairs(
                df, "text", "doc_id", k=1, threshold=0.0
            ).collect()
        }
        sets = {i: set(toks) for i, toks in enumerate(docs_toks)}
        want = {
            (a, b): len(sets[a] & sets[b]) / len(sets[a])
            for a in sets
            for b in sets
            if a != b and sets[a] & sets[b]
        }
        assert got == want
        assert all(0.0 < v <= 1.0 for v in got.values())


class TestBpeProperty:
    @given(
        st.lists(st.sampled_from(["ab", "abc", "aab", "ba", "c"]),
                 min_size=3, max_size=12)
        .filter(lambda ws: any(len(w) >= 2 for w in ws))
    )
    @settings(**SETTINGS)
    def test_bpe_first_merge_is_argmax_pair(self, spark, words):
        """Round-1 merge == the argmax adjacent char pair (count desc,
        pair asc) computed in plain Python with the same LTR-overlap
        counting."""
        from collections import Counter

        from graphrag_toolkit_spark.operators.packing import bpe_train_merges

        df = spark.createDataFrame([{"text": " ".join(words)}])
        got = bpe_train_merges(df, "text", rounds=1).collect()[0]
        counts = Counter()
        for w in words:
            for i in range(len(w) - 1):
                counts[(w[i], w[i + 1])] += 1
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (got["sym_a"], got["sym_b"], got["n"]) == (*best[0], best[1])


class TestMortonProperty:
    def test_interleave_is_bijective_and_order_preserving_on_quadrants(self, spark):
        """Morton decode(encode(x, y)) == (x, y) for random 8-bit pairs
        (bijectivity = no two rows collide into one file slot), and the
        top bit pair selects the quadrant (the envelope-tightness
        mechanism)."""
        from graphrag_toolkit_spark.operators.packing import morton_sql

        pairs = [((i * 37) % 256, (i * 101) % 256) for i in range(300)]
        df = spark.createDataFrame(pairs, "x long, y long")
        rows = df.selectExpr(
            "x", "y", f"{morton_sql('x', 'y', bits=8)} AS z"
        ).collect()

        def decode(z: int) -> tuple[int, int]:
            x = y = 0
            for i in range(8):
                x |= ((z >> (2 * i)) & 1) << i
                y |= ((z >> (2 * i + 1)) & 1) << i
            return x, y

        seen = set()
        for r in rows:
            assert decode(r["z"]) == (r["x"], r["y"])
            seen.add(r["z"])
            quad = (r["x"] >= 128, r["y"] >= 128)
            top = ((r["z"] >> 14) & 1 == 1, (r["z"] >> 15) & 1 == 1)
            assert quad == top
        assert len(seen) == len(set(pairs))
