"""Formatting processors over NESTED SearchResult rows (SURVEY §2.10's
formatting chain; reference ``traversal_based_base_retriever.py:39-46``
DEFAULT_FORMATTING_PROCESSORS = StatementsToStrings →
SimplifySingleTopicResults → FormatSources → ClearChunks → ClearTopicIds →
TruncateResults).

Everything here is a pure higher-order array expression (``transform`` /
``filter`` over the ``topics`` struct array) — the nested rows are never
exploded and re-grouped, so the formatting chain adds ZERO shuffles to the
tail of the retrieval plan, in contrast to the reference's per-result Python
loops. Output schemas stay fixed per processor so chains compose.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType


def _statement_str(s: Column, details_is_array: bool) -> Column:
    """``populate_statement_strs.py:58-70``: 'value (details: f1, f2, d1)'
    where the detail list is facts ++ detail lines (newline-split when the
    engine stores details as one string; taken as-is when it stores an
    array); bare value when both are empty."""
    if details_is_array:
        detail_lines = F.filter(
            F.coalesce(s["details"], F.array().cast("array<string>")),
            lambda d: d != "",
        )
    else:
        detail_lines = F.when(
            s["details"].isNotNull() & (s["details"] != ""),
            F.split(s["details"], "\n"),
        ).otherwise(F.array().cast("array<string>"))
    detail_parts = F.concat(
        F.coalesce(s["facts"], F.array().cast("array<string>")), detail_lines
    )
    return F.when(
        F.size(detail_parts) > 0,
        F.concat(
            s["value"], F.lit(" (details: "),
            F.concat_ws(", ", detail_parts), F.lit(")"),
        ),
    ).otherwise(s["value"])


def _details_is_array(nested: DataFrame) -> bool:
    stype = (
        nested.schema["topics"].dataType.elementType["statements"]
        .dataType.elementType["details"].dataType
    )
    return isinstance(stype, ArrayType)


def statements_to_strings(nested: DataFrame) -> DataFrame:
    """StatementsToStrings (+ the PopulateStatementStrs composition it
    consumes): each topic's statement structs become display strings,
    score-ordered (score desc, statement_id asc). Topics struct is rebuilt
    with ``statements: array<string>``."""
    details_is_array = _details_is_array(nested)

    def topic_out(t: Column) -> Column:
        ordered = F.array_sort(
            F.transform(
                t["statements"],
                lambda s: F.struct(
                    (-s["score"]).alias("_neg"),
                    s["statement_id"].alias("_id"),
                    _statement_str(s, details_is_array).alias("s"),
                ),
            )
        )
        return F.struct(
            t["topic_id"].alias("topic_id"),
            t["topic"].alias("topic"),
            t["chunks"].alias("chunks"),
            F.transform(ordered, lambda x: x["s"]).alias("statements"),
        )

    return nested.withColumn("topics", F.transform("topics", topic_out))


def simplify_single_topic_results(nested: DataFrame) -> DataFrame:
    """SimplifySingleTopicResults: a result with exactly one topic lifts
    ``topic`` and ``statements`` to the result level and clears ``topics``;
    multi-topic results pass through with null lifted columns. Run AFTER
    ``statements_to_strings`` (statements are strings by then)."""
    single = F.size("topics") == 1
    first = F.element_at("topics", 1)
    return (
        nested.withColumn("topic", F.when(single, first["topic"]))
        .withColumn("statements", F.when(single, first["statements"]))
        .withColumn(
            "topics",
            F.when(single, F.array().cast(nested.schema["topics"].dataType))
            .otherwise(F.col("topics")),
        )
    )


def format_sources(
    nested: DataFrame, source_metadata: DataFrame | None = None
) -> DataFrame:
    """FormatSources (``format_sources.py:15-33`` default formatter): the
    source string is the LONGEST metadata value followed by the others in
    parentheses — or the bare source_id when no metadata exists.
    ``source_metadata``: optional (source_id, metadata map<string,string>);
    broadcast-joined (dimension-sized by construction)."""
    if source_metadata is None:
        return nested.withColumn("source_str", F.col("source_id"))
    vals_sorted = F.transform(
        F.array_sort(
            F.transform(
                F.map_values(F.col("metadata")),
                lambda v: F.struct(
                    (-F.length(v)).alias("_neg"), v.alias("v")
                ),
            )
        ),
        lambda x: x["v"],
    )
    source_str = F.when(
        F.size(vals_sorted) > 1,
        F.concat(
            F.element_at(vals_sorted, 1),
            F.lit(" ("),
            F.concat_ws(", ", F.slice(vals_sorted, 2, 1_000_000)),
            F.lit(")"),
        ),
    ).when(F.size(vals_sorted) == 1, F.element_at(vals_sorted, 1))
    meta = F.broadcast(
        source_metadata.select("source_id", source_str.alias("source_str"))
    )
    return nested.join(meta, "source_id", "left").withColumn(
        "source_str", F.coalesce(F.col("source_str"), F.col("source_id"))
    )


def clear_chunks(nested: DataFrame) -> DataFrame:
    """ClearChunks: drop chunk payloads from every topic (context strings
    have been extracted by now; chunks are the heavyweight column)."""
    return nested.withColumn(
        "topics",
        F.transform(
            "topics",
            lambda t: F.struct(
                t["topic_id"].alias("topic_id"),
                t["topic"].alias("topic"),
                F.array().cast(
                    nested.schema["topics"].dataType.elementType["chunks"].dataType
                ).alias("chunks"),
                t["statements"].alias("statements"),
            ),
        ),
    )


def clear_topic_ids(nested: DataFrame) -> DataFrame:
    """ClearTopicIds: null out internal topic ids before handing results to
    a consumer (ids are engine-internal; values are the payload)."""
    return nested.withColumn(
        "topics",
        F.transform(
            "topics",
            lambda t: F.struct(
                F.lit(None).cast("string").alias("topic_id"),
                t["topic"].alias("topic"),
                t["chunks"].alias("chunks"),
                t["statements"].alias("statements"),
            ),
        ),
    )


def disaggregate_results(nested: DataFrame) -> DataFrame:
    """DisaggregateResults (``disaggregate_results.py``): split every
    multi-topic result into one result per topic (same source, same score,
    single-element topics array). A narrow explode — no shuffle."""
    return (
        nested.withColumn("_t", F.explode("topics"))
        .withColumn("topics", F.array("_t"))
        .drop("_t")
    )


def clear_scores(nested: DataFrame) -> DataFrame:
    """ClearScores (``clear_scores.py`` / ``zero_scores.py``): zero the
    result- and statement-level scores once ordering has been consumed —
    consumers must not treat internal scores as meaningful."""
    zeroed_topics = F.transform(
        "topics",
        lambda t: F.struct(
            t["topic_id"].alias("topic_id"),
            t["topic"].alias("topic"),
            t["chunks"].alias("chunks"),
            F.transform(
                t["statements"],
                lambda s: F.struct(
                    s["statement_id"].alias("statement_id"),
                    s["value"].alias("value"),
                    s["details"].alias("details"),
                    s["facts"].alias("facts"),
                    F.lit(0.0).alias("score"),
                ),
            ).alias("statements"),
        ),
    )
    return nested.withColumn("score", F.lit(0.0)).withColumn(
        "topics", zeroed_topics
    )


def truncate_results(nested: DataFrame, max_results: int = 5) -> DataFrame:
    """TruncateResults at the nested level: total order (score desc,
    source_id asc) then limit."""
    return nested.orderBy(F.desc("score"), F.asc("source_id")).limit(max_results)


def format_chain(
    nested: DataFrame,
    source_metadata: DataFrame | None = None,
    max_results: int = 5,
) -> DataFrame:
    """The default formatting chain in reference order."""
    out = statements_to_strings(nested)
    out = simplify_single_topic_results(out)
    out = format_sources(out, source_metadata)
    out = clear_chunks(out)
    out = clear_topic_ids(out)
    return truncate_results(out, max_results)
