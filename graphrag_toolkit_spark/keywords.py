"""Keyword provider matrix (SURVEY §2.10): ``llm | nlp | vss | passthru``.

Parity target: the reference's ``ec_keyword_provider`` switch in
``retrieval/retrievers/traversal_based_base_retriever.py:219-257`` with one
provider class each (``retrieval/query_context/``):

- **passthru** (``pass_thru_keyword_provider.py``): the query string itself.
- **llm** (``keyword_provider.py:45-81``): an injected ``llm(prompt) -> str``
  returns '^'-separated keywords; case-insensitive dedup keeps the first
  surface form.
- **nlp** (``keyword_nlp_provider.py:31-36``): the reference runs spaCy NER
  and keeps ``doc.ents`` deduped case-insensitively. The model-free analog
  here extracts maximal runs of capitalized tokens (the NER-shaped surface
  signal), drops stopwords/short tokens, and dedups case-insensitively
  preserving first occurrence — implemented BOTH as a JVM column expression
  (``nlp_keywords_col`` — regexp + higher-order array ops, no UDF, runs
  distributed over a column of queries/documents and is DuckDB-oracle-
  expressible) and as a driver-side twin (``nlp_keywords_py``) for
  single-query retrieval paths; a contract test pins the two equal.
- **vss**: seeds come from the query embedding (``operators/vss.py``), so
  keyword extraction degenerates to passthru — the VSS provider's extra
  value in the reference is entity matching, covered by
  ``operators/entity.lookup_entities``.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LLM = Callable[[str], str]

# Maximal runs of capitalized tokens, single space separated. Same pattern
# string compiles identically under Java regex (Spark) and RE2 (DuckDB).
CAP_RUN_RE = r"[A-Z][A-Za-z0-9]*(?: [A-Z][A-Za-z0-9]*)*"

# Filter for capitalized sentence-starters that aren't entity-like. Distinct
# from textstats.STOPWORDS (a language-ID lexicon): this list exists to keep
# question scaffolding out of keyword seeds.
KEYWORD_STOPWORDS = (
    "the a an and or but of to in on at for with from by is are was were be "
    "been being what which who whom whose when where why how do does did done "
    "can could should would will shall may might must it its this that these "
    "those i you he she we they them there here not no yes if then else about"
).split()

MAX_KEYWORDS_DEFAULT = 10


def nlp_keywords_col(text: Column) -> Column:
    """``array<string>`` of nlp-provider keywords for a text column: maximal
    capitalized runs → length/stopword filter → case-insensitive stable
    dedup (first surface form wins). Pure JVM expression: regexp + filter +
    a fold that threads (seen-lowercase, kept) arrays — no UDF, no shuffle."""
    runs = F.regexp_extract_all(text, F.lit(CAP_RUN_RE), 0)
    # drop a run only when EVERY token is scaffolding ("What", "A An The…");
    # mixed runs like "The White House" keep their full surface form
    kept = F.filter(
        runs,
        lambda k: (F.length(k) >= 2)
        & ~F.forall(
            F.split(F.lower(k), " "), lambda t: t.isin(*KEYWORD_STOPWORDS)
        ),
    )
    acc0 = F.struct(
        F.array().cast("array<string>").alias("seen"),
        F.array().cast("array<string>").alias("out"),
    )
    folded = F.aggregate(
        kept,
        acc0,
        lambda acc, k: F.when(
            F.array_contains(acc["seen"], F.lower(k)), acc
        ).otherwise(
            F.struct(
                F.array_append(acc["seen"], F.lower(k)).alias("seen"),
                F.array_append(acc["out"], k).alias("out"),
            )
        ),
    )
    return folded["out"]


def nlp_keywords(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Distributed nlp keyword extraction: (id, pos, keyword) rows, ``pos``
    = 0-based first-occurrence order within the text."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(nlp_keywords_col(F.col(text_col))).alias("pos", "keyword"),
    )


_CAP_RUN_PY = re.compile(CAP_RUN_RE)


def nlp_keywords_py(text: str) -> list[str]:
    """Driver-side twin of ``nlp_keywords_col`` for single-query retrieval
    paths. Same regex, same filter, same dedup — the contract test pins
    equality with the column expression."""
    out: list[str] = []
    seen: set[str] = set()
    for k in _CAP_RUN_PY.findall(text):
        kl = k.lower()
        if (
            len(k) < 2
            or all(t in KEYWORD_STOPWORDS for t in kl.split(" "))
            or kl in seen
        ):
            continue
        seen.add(kl)
        out.append(k)
    return out


def llm_keywords(
    llm: LLM, query_text: str, max_keywords: int = MAX_KEYWORDS_DEFAULT
) -> list[str]:
    """LLM provider (keyword_provider.py:45-81): '^'-separated reply,
    case-insensitive dedup (reference lowercases the kept form)."""
    reply = llm(
        f"Extract at most {max_keywords} search keywords from the query, "
        f"separated by '^':\n{query_text}"
    )
    keywords = [k.strip() for k in reply.split("^") if k.strip()]
    unique = list({k.lower(): None for k in keywords}.keys())
    return unique[:max_keywords]


def get_keywords(
    mode: str,
    query_text: str,
    llm: LLM | None = None,
    max_keywords: int = MAX_KEYWORDS_DEFAULT,
) -> list[str]:
    """Resolve the provider matrix for a single query string. ``vss`` and
    ``passthru`` return the query itself (seeding differs downstream, not
    here); ``llm`` requires an injected callable; ``nlp`` is model-free."""
    if mode in ("passthru", "vss"):
        return [query_text]
    if mode == "llm":
        if llm is None:
            raise ValueError("keyword_provider='llm' requires an llm callable")
        return llm_keywords(llm, query_text, max_keywords)
    if mode == "nlp":
        return nlp_keywords_py(query_text)[:max_keywords]
    raise ValueError(
        f"invalid keyword provider {mode!r}: expected one of llm, vss, nlp, passthru"
    )
