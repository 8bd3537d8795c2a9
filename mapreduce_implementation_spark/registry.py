"""Query registry — the engine's public query surface.

Every capability from SURVEY.md §2/§2b registers here as a named query:
a Spark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are SQL-expressible, a DuckDB oracle SQL string over the same
parquet fixture tables.  ``__spark_entry__.py`` re-exports this registry
to the driver, and tests/test_oracle_queries.py cross-checks every pair
the same way the driver does (row count + schema + order-insensitive
values).

Conventions (driver contract):
* every computed column is aliased identically in Spark and SQL;
* float aggregates are ``round(x, 2)`` on BOTH sides so summation-order
  differences below 1e-5 cannot flip the value hash;
* DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT,
  Spark stays long);
* timestamps that reach an output are formatted to ``yyyy-MM-dd HH:mm:ss``
  strings on both sides to erase precision/timezone representation drift.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver falls back to rows-only check
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn
    return deco


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle}


_LOADED = False

# Driver-sample rotation: the driver records ~50 queries per round in
# registry iteration order.  Round-5 policy (VERDICT r04 items 1, 2, 4):
# `pipeline_sequence_packing` stays FIRST (red r03+r04 rows — the
# value-derived-bucket rewrite needs its green driver row), then the
# round-5 additions (first-ever driver rows), then every query whose
# IMPLEMENTATION changed this round (the two-phase window rewrite and
# the ANN oracle graduations — driver re-confirmation of changed code),
# then the queries whose latest driver row dates from r01/r02 (stalest
# first); the r03/r04-green remainder keeps import order at the back.
_SAMPLE_FIRST = (
    "pipeline_sequence_packing",
    # --- round-5 additions (no driver row yet) ---
    "agg_trimmed_mean", "corpus_source_topp", "agg_skew_kurtosis",
    "text_dedup_exact_normalized",
    "text_keyphrase_rake", "multimodal_video_framesample",
    "corpus_quality_deciles_by_source", "pipeline_budget_resample",
    "graph_sssp_weighted", "sessions_interval_overlap",
    "corpus_length_quantiles_by_source",
    "join_bloom_prefilter", "sample_weighted_systematic",
    # --- implementation changed this round: re-verify ---
    "window_global_ntile", "rfm_segments", "text_perplexity_buckets",
    "text_zipf_alpha", "agg_weighted_median", "agg_weighted_median_by_flag",
    "sort_nulls_ordering",
    "similarity_ann_lsh", "similarity_ann_ivf", "dedup_embedding_lsh",
    # --- stale: latest driver row is r01/r02, stalest first ---
    "pipeline_fingerprint_dedup", "text_bm25_top10",
    "text_pmi_pairs", "text_bigram_logprob", "text_contamination_4gram",
    "text_repetition_gopher", "window_rank", "window_row_number_topk",
    "window_lag_lead", "window_running_sum", "window_moving_avg",
    "window_range_frame", "window_percent_rank_cume",
    "udtf_order_years", "pandas_udf_charge", "pandas_udaf_rms_spend",
    "subq_exists_late_ship", "subq_custdist", "subq_in_large_orders",
    "subq_scalar_anti_q22", "graph_pagerank_trade", "funnel_conversion",
    "cohort_retention", "timeseries_gap_fill", "scd2_intervals",
    "agg_regression_price_qty", "stats_chi2_event_dow",
    "anomaly_daily_zscore", "tokenize", "word_count", "distributed_sort",
    "distributed_sort_desc", "partitioned_scan_events_week", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_simhash",
    "dedup_embedding_cosine", "dedup_clusters",
    "dedup_ngram_jaccard_prefix", "dedup_tfidf_cosine",
    "dedup_cluster_representatives", "agg_percentiles",
    "agg_conditional_filter", "null_handling", "date_arithmetic",
    "array_functions", "grouping_sets_sql", "join_full_outer",
    "sql_correlated_subquery", "union_all_counts", "window_first_last",
    "join_broadcast_dims", "join_shuffle_facts", "join_semi", "join_anti",
    "join_left_outer", "join_tpch_q5_shape", "asof_join_latest_order",
    "range_join_sessions", "agg_tpch_q1", "agg_minmax_multi_key",
    "scalar_string_math", "scalar_date_functions", "top_k",
    "set_union_distinct", "set_intersect", "set_except", "distinct_rows",
    "rollup_agg", "cube_agg", "pivot_linestatus", "similarity_cosine_topk",
    "window_tumbling_events",
    "window_sliding_events", "sessionize_events", "stream_join_attribution",
    "multimodal_binary_meta", "multimodal_decode_stub",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .queries import (  # noqa: F401
        textanalysis, windows, udf_surface, subqueries, graph,
        analytics, core, curation, dedup, functions_surface, joins,
        profiling, relational, similarity, streaming_batch,
    )
    ordered = {n: _REGISTRY[n] for n in _SAMPLE_FIRST if n in _REGISTRY}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)
    _LOADED = True
