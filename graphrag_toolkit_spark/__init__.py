"""graphrag_toolkit_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of awslabs/graphrag-toolkit.

Design stance (see SURVEY.md §7): the lexical graph is a set of node/edge
DataFrames; every reference operator is a function ``DataFrame(s) -> DataFrame``
with an explicit schema contract. Pure DataFrame API + MLlib; no RDDs, no
driver-side row loops except bounded iterative frontiers (beam/BFS). All
nondeterminism is pinned (sorted collect_lists, seeded fake models, hash ids).
"""

__version__ = "0.1.0"

from graphrag_toolkit_spark.session import build_session  # noqa: F401
