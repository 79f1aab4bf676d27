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

# Queries the driver's capped per-round check has NOT yet hash-verified
# (new this round, or rotated out in every prior round) go FIRST so a
# count- or time-capped checker reaches them before re-verifying old green
# entries. Names absent from the registry are ignored; everything not
# listed keeps module order after these.
_CHECK_FIRST = [
    # new in round 3 — never driver-checked
    "asof_join_events",
    "interval_join_events",
    "kmv_distinct_users_events",
    "semantic_dedup_embeddings",
    "katz_centrality_graph",
    "bm25_documents",
    "hybrid_rrf_documents",
    "cube_stats_orders",
    "pivot_orders_by_priority",
    "ngram_lm_documents",
    "word_entropy_documents",
    "corpus_diff_documents",
    "personalized_katz_graph",
    "cms_heavy_hitters_documents",
    "bloom_filter_orders",
    "resample_gapfill_events",
    "zscore_anomalies_events",
    "k_anonymity_documents",
    "zipf_fit_documents",
    "cohort_retention_events",
    "json_stats_events",
    "association_rules_parts",
    "cdc_apply_orders",
    "triangle_count_parts",
    "boolean_and_search_documents",
    "decile_stats_orders",
    "event_transitions",
    "training_data_pipeline",
    "validate_orders",
    "moving_avg_events",
    "funnel_conversion_events",
    "train_bigram_lm_documents",
    "ranking_eval_embeddings",
    "build_vocab_documents",
    "encode_documents_corpus",
    "range_window_events",
    "unpivot_orders_by_priority",
    "weighted_katz_parts",
    "robust_stats_events",
    "percent_rank_orders",
    "interarrival_stats_events",
    "embedding_component_stats",
    "rfm_segments_customers",
    "latest_order_per_customer",
    "calendar_stats_orders",
    "dup_span_coverage_documents",
    "scrub_dup_spans_documents",
    "shard_corpus_documents",
    "soft_dedup_weights_documents",
    "quality_classifier_documents",
    "hot_grams_documents",
    "repetition_stats_documents",
    "decontaminate_documents",
    "pii_scrub_documents",
    "resample_mix_documents",
    "pq_codes_embeddings",
    "pq_adc_topk",
    "pack_sequences_documents",
    "dedup_keep_best_documents",
    # never driver-checked as of round 2
    "beam_search_attention",
    "embedding_neardup_lsh",
    "nlp_keywords_customers",
    "fuzzy_link_token_set",
    "embedding_neardup_recall",
    "ann_ivf_kmeans_topk",
    "extract_build_counts",
    "extract_build_fact_graph",
    "extract_build_statements",
    "percentile_stats_events",
    "schema_summary_supplies",
    # green in round 1 but rotated out of round 2's 50
    "ann_ivf_topk",
    "cascade_delete_counts",
    "event_type_funnel",
    "multimodal_decode",
    "multimodal_frames",
    "processor_chain_statements",
    "scd2_versioning_orders",
    "sessionize_events",
    "sliding_window_events",
    "statements_per_topic_histogram",
    "token_budget_truncate",
    "tumbling_window_events",
    "versions_at_snapshot",
]


def _prioritized(merged: dict) -> dict:
    head = {n: merged[n] for n in _CHECK_FIRST if n in merged}
    tail = {n: v for n, v in merged.items() if n not in head}
    return {**head, **tail}


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return _prioritized(out)


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return _prioritized(out)
