"""Sentence-aware chunking (SURVEY §2.1 S3).

Parity target: ``SentenceSplitter(chunk_size=256, chunk_overlap=25)`` at
``lexical_graph_index.py:197``. Packing sentences into token-bounded windows
is sequential *within* a document but independent *across* documents — the
exact shape ``mapInPandas`` parallelizes: each Arrow batch of documents is
chunked in Python, emitting (chunk_id, source_id, chunk_index, text) rows.
Chunk ids are content-addressed (``ids.py`` scheme) so re-chunking is
idempotent.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

CHUNK_SCHEMA = "chunk_id string, source_id string, chunk_index int, text string"

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


def _split_sentences(text: str) -> list[str]:
    return [s for s in _SENTENCE_RE.split(text) if s.strip()]


def _pack(
    sentences: list[str], chunk_size: int, chunk_overlap: int
) -> list[str]:
    """Greedy sentence packing into ≤chunk_size-token windows; the last
    ``chunk_overlap`` tokens of a chunk seed the next (context continuity).
    Sentences longer than a window are hard-split."""
    assert 0 <= chunk_overlap < chunk_size
    chunks: list[str] = []
    current: list[str] = []   # tokens
    for sent in sentences:
        toks = sent.split()
        if current and len(current) + len(toks) > chunk_size:
            chunks.append(" ".join(current))
            current = current[-chunk_overlap:] if chunk_overlap else []
        while len(current) + len(toks) > chunk_size:
            space = chunk_size - len(current)
            filled = current + toks[:space]
            chunks.append(" ".join(filled))
            current = filled[-chunk_overlap:] if chunk_overlap else []
            toks = toks[space:]
        current.extend(toks)
    if current:
        chunks.append(" ".join(current))
    return chunks


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 256,
    chunk_overlap: int = 25,
) -> DataFrame:
    """(doc_id, text) → (chunk_id, source_id, chunk_index, text) via
    Arrow-batched per-document packing."""
    src = docs.select(
        docs[id_col].cast("string").alias("source_id"), docs[text_col].alias("text")
    )

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for source_id, text in zip(pdf["source_id"], pdf["text"]):
                pieces = _pack(_split_sentences(text or ""), chunk_size, chunk_overlap)
                for i, piece in enumerate(pieces):
                    h = hashlib.md5(piece.encode()).hexdigest()[:8]
                    rows.append((f"{source_id}:{h}", source_id, i, piece))
            yield pd.DataFrame(
                rows, columns=["chunk_id", "source_id", "chunk_index", "text"]
            )

    return src.mapInPandas(chunk_batches, schema=CHUNK_SCHEMA)
