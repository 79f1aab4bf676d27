"""Declared operator workload: every implemented operator from SURVEY.md §2
exposed as a named (spark, sf_dir) -> DataFrame callable plus a DuckDB oracle
SQL string over the same tables.

Module registry pattern: each submodule defines ``QUERIES`` and ``ORACLES``;
``all_queries()`` / ``all_oracles()`` merge them for ``__spark_entry__``.

Exact-match discipline (the driver hash-compares values against DuckDB):
- money aggregation happens in DECIMAL (inputs are exact 2-decimal doubles, so
  the decimal cast is exact); final results are rounded in the decimal domain
  then cast to double (exactly representable), never summed as doubles.
- any division happens in the double domain on exact operands (identical IEEE
  result in both engines).
- every LIMIT is preceded by a total order (score desc, unique id asc).
- arrays are sorted then stringified (``concat_ws``) — collect order is never
  relied on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from graphrag_toolkit_spark.workload import (
    dataprep,
    events,
    graphish,
    lexical,
    lifecycle,
    pipeline,
    relational,
    vector,
)

_MODULES = [relational, graphish, lexical, vector, dataprep, events, lifecycle, pipeline]


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
