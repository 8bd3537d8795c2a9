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
* KNOWN residual class (r8, observed once at sf0.001): Spark's round()
  rounds a double's shortest decimal-string repr (BigDecimal.valueOf)
  while DuckDB rounds the binary value, so an aggregate landing on an
  exact ``.xx5`` boundary can round apart even with identical inputs.
  Where money-like data makes that boundary likely (averages of
  2-decimal values), quantize at 6 decimals first on BOTH sides —
  ``F.round(x, 6)`` / ``CAST(x AS DECIMAL(28,6))`` — before the
  2-decimal round (see join_broadcast_dims);
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
# round in registry iteration order.  Round-8 policy (VERDICT r07 item
# 1): registrations stay FROZEN and the 50-slot window goes to the
# stale tail — all 40 queries whose latest driver row dates from r03,
# then 10 priority picks: the two r8 graduations (dedup_minhash_lsh /
# dedup_simhash — rows-only until now, their new bounded hash oracles
# need driver-green rows), the two r04-stale graph queries whose
# operators the r8 ADVICE fixes touched (label_propagation — now
# integral-weight-gated with bigint caller weights — and
# bfs_distances), graph_personalized_pagerank (r06 row, but its dense
# Arrow fast path is NEW this round — the driver must hash-check the
# code that actually runs), and the 5 alphabetically-first remaining
# r04-stale queries.  After this round no query's latest driver row
# predates r04; the remaining 38 r04 rows rotate in r9, which closes
# the staleness debt entirely.
_SAMPLE_FIRST = (
    # --- stale, latest driver row r03 ---
    "agg_tpch_q6_forecast", "dedup_chunk_signature",
    "dedup_incremental_batch", "dedup_incremental_stored_grams",
    "dedup_semantic_blocked", "dedup_span_rebuild", "embedding_centroids",
    "graph_triangle_count", "histogram_totalprice",
    "inference_scores_batched", "join_tpch_q10_shape",
    "join_tpch_q15_shape", "join_tpch_q19_shape", "join_tpch_q3_shape",
    "join_tpch_q7_shape", "join_tpch_q9_shape", "lateral_explode_outer",
    "map_type_surface", "nested_struct_array_agg", "pagination_offset",
    "pii_mask_digits", "pipeline_curation_stats", "profile_columns",
    "sample_hash_pct", "sample_stratified", "set_except_all",
    "similarity_quantized_topk", "skew_join_salted",
    "source_csv_roundtrip", "source_jsonl_events",
    "source_mixing_weights", "source_orc_roundtrip",
    "streaks_gaps_islands", "string_similarity_levenshtein",
    "text_quality_classifier", "text_quality_score", "text_token_entropy",
    "text_token_stats", "text_top_terms_per_lang",
    "unpivot_lineitem_measures",
    # --- r8 graduations: fresh hash rows for the new oracles ---
    "dedup_minhash_lsh", "dedup_simhash",
    # --- r04-stale graph queries whose operators changed this round ---
    "graph_label_propagation", "graph_bfs_distances",
    # --- new dense path this round: driver must check the live code ---
    "graph_personalized_pagerank",
    # --- alphabetical head of the remaining r04-stale block ---
    "agg_approx_stats", "agg_hll_distinct", "anomaly_daily_mad",
    "basket_lift_pairs", "cdc_merge_upsert",
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
