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

# Driver-sample rotation: the driver records exactly 50 queries per
# round in registry iteration order.  Round-7 policy (VERDICT r06 item
# 1): registrations are FROZEN this round and the whole 50-slot window
# goes to the stale tail — the 29 queries whose latest driver row dates
# from r01, then the 16 from r02, then `dedup_semantic_kmeans` (r03,
# rows-only, graduating to a bounded hash oracle this round — needs the
# fresh row) and the 4 alphabetically-first r03-stale queries.  After
# this round every query's latest driver row is r06/r07 except the
# remaining r03/r04 blocks (40 + 45), which rotate next.
_SAMPLE_FIRST = (
    # --- stale, latest driver row r01 ---
    "distinct_rows", "grouping_sets_sql", "join_anti",
    "join_broadcast_dims", "join_full_outer", "join_left_outer",
    "join_semi", "join_shuffle_facts", "join_tpch_q5_shape",
    "multimodal_binary_meta", "multimodal_decode_stub", "null_handling",
    "pivot_linestatus", "range_join_sessions", "rollup_agg",
    "scalar_date_functions", "scalar_string_math", "sessionize_events",
    "set_except", "set_intersect", "set_union_distinct",
    "similarity_cosine_topk", "sql_correlated_subquery",
    "stream_join_attribution", "top_k", "union_all_counts",
    "window_first_last", "window_sliding_events", "window_tumbling_events",
    # --- stale, latest driver row r02 ---
    "anomaly_daily_zscore", "dedup_cluster_representatives",
    "dedup_clusters", "dedup_embedding_cosine", "dedup_exact",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_ngram_jaccard_prefix",
    "dedup_simhash", "dedup_tfidf_cosine", "distributed_sort",
    "distributed_sort_desc", "partitioned_scan_events_week",
    "stats_chi2_event_dow", "tokenize", "word_count",
    # --- stale, latest driver row r03 (head of the next-stalest block) ---
    "dedup_semantic_kmeans",
    "agg_decimal_exact", "agg_mode_per_group", "agg_percentiles_exact",
    "agg_stat_moments",
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
