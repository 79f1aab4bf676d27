from graphrag_toolkit_spark.functions.text import (  # noqa: F401
    search_string,
    label_from,
    relationship_name,
    verbalize_fact,
    statement_text,
)
from graphrag_toolkit_spark.functions.vector import (  # noqa: F401
    dot,
    l2_norm,
    cosine_similarity,
    unit_normalize,
)
