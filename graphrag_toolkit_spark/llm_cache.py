"""Deterministic on-disk LLM response cache (SURVEY §4 cache row; reference
``utils/`` ``LLMCache`` + the embedding LRU of ``statement_utils.py:196-286``).

Key = md5 of (model tag ++ prompt); value = the raw response text, one file
per key, atomically written. Driver-side by design: it serves the
driver-looped LLM stages (agentic retrieval, query decomposition, query-mode
detection, keyword extraction, InferClassifications) exactly where the
reference caches. Model calls inside Arrow ``mapInPandas`` stages should use
a per-executor cache instead — a shared posix directory is a contention
point at 1000 executors, not a cache.

Determinism is the point: cached runs replay byte-identical responses, so a
pipeline re-run (or a test) is reproducible even when the underlying model
isn't.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

LLM = Callable[[str], str]


def cache_key(prompt: str, model_tag: str = "default") -> str:
    return hashlib.md5(f"{model_tag}\x00{prompt}".encode()).hexdigest()


def cached_llm(llm: LLM, cache_dir: str, model_tag: str = "default") -> LLM:
    """Wrap an ``llm(prompt) -> str`` with a persistent response cache.

    The wrapper exposes ``.hits`` / ``.misses`` counters and a
    ``.cache_path(prompt)`` helper. Writes are atomic (temp file + rename),
    so concurrent driver processes sharing a cache dir never observe torn
    responses; last-writer-wins is safe because keyed responses are
    deterministic by contract."""

    def wrapper(prompt: str) -> str:
        path = wrapper.cache_path(prompt)
        try:
            with open(path, encoding="utf-8") as f:
                wrapper.hits += 1
                return f.read()
        except FileNotFoundError:
            pass
        wrapper.misses += 1
        out = llm(prompt)
        os.makedirs(cache_dir, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".part")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(out)
            os.replace(tmp, path)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        return out

    wrapper.hits = 0
    wrapper.misses = 0
    wrapper.cache_path = lambda prompt: os.path.join(
        cache_dir, cache_key(prompt, model_tag) + ".txt"
    )
    return wrapper
