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
# round in registry iteration order.  Registrations stay FROZEN; only
# this sample-order tuple moves each round.
#
# Steady-state cadence (VERDICT r08 item 7, r9 on): each round the
# window takes the 50 queries whose latest driver row is OLDEST,
# breaking ties alphabetically (new registrations have no row and sort
# first).  With ~239 registered queries and 50 slots per round, every
# query gets a fresh driver row at least once every ~5 rounds, so
# freshness debt can never re-accumulate.
#
# Change-awareness (r9 ADVICE): a query whose OUTPUT-DETERMINING
# registration changed — its impl, its oracle, or a behavior change in
# an operator it calls — is treated as round-0 stale until a driver
# row lands at-or-after the round of the change, recorded in
# _CHANGED_IN_ROUND below.  Entries expire automatically once the
# driver row arrives (latest[q] >= flagged round); prune expired
# entries opportunistically at each rotation.  Mechanical refactors
# verified behavior-identical by the suite do NOT flag (e.g. the r10
# _by_key_cast helper extraction leaves scd2_point_in_time_join's plan
# byte-identical — its keys are same-typed, so by_cast=None before and
# after).
#
# Recompute per round as
#   latest[q] = max round over CORRECTNESS_r0*.json containing q;
#   eff[q]    = 0 if latest[q] < _CHANGED_IN_ROUND.get(q, 0) else latest[q];
#   window    = sorted(queries, key=(eff[q], q))[:50].
# Machine-checked: tests/test_properties.py::
# test_sample_window_is_the_stalest_fifty recomputes the window from
# the checked-in CORRECTNESS files and fails once a new round's file
# lands — fixing it IS the rotation step.
#
# r13 window: CORRECTNESS_r12 landed 50/50 green (all full hash
# matches), exactly as pre-computed last round, so the r12
# _CHANGED_IN_ROUND entry (pii_scrub_multi — r12-green) is pruned.
# The window is the r12 pre-computation with this round's new
# registrations slotting in at round-0 (alphabetical):
# dedup_bloom_frontier_rolling, dedup_chunks_content_defined,
# pipeline_shard_assignment, sketch_hll_rolling_window,
# split_leakage_audit, text_bpe_train_merges_batched + the first 44
# of the 47 remaining r08-row queries (anomaly_daily_mad ..
# text_token_entropy) — the six new slots displace the three
# alphabetical r09 fillers (agg_regression_price_qty,
# agg_skew_kurtosis, agg_trimmed_mean) and the last three r08 rows
# (text_token_stats, text_top_terms_per_lang,
# unpivot_lineitem_measures).
# Machine-recomputed at rotation time from the checked-in CORRECTNESS
# files — set-equal to the guard test's recomputation.
#
# Pre-computed r14 window (assuming CORRECTNESS_r13 lands with the 50
# below; r13 registrations/change flags added during the round slot in
# as round-0 entries at the front, displacing the alphabetical tail):
# the 10 remaining r09-row queries (asof_join_events ..
# window_lead_lag_deltas) + the first 40 r10-row queries
# alphabetically.  The guard test recomputes the truth either way —
# a head start, not an answer.
_CHANGED_IN_ROUND: dict[str, int] = {
    # r13 changes that do NOT flag: bloom_anti_join gained float-key
    # normalization (r12 ADVICE) — a behavior change only for
    # float/double keys, and dedup_bloom_frontier probes STRING keys,
    # so its plan is byte-identical; the six NEW registrations
    # (dedup_bloom_frontier_rolling, split_leakage_audit,
    # pipeline_shard_assignment, text_bpe_train_merges_batched,
    # sketch_hll_rolling_window, dedup_chunks_content_defined) have
    # no driver row at all and enter the window as round-0 via
    # _SAMPLE_FIRST ordering, which is the mechanism for new queries
    # (a _CHANGED_IN_ROUND entry would be redundant: latest[q] is
    # already unset).
}

_SAMPLE_FIRST = (
    # --- round-0 stale: new registrations this round ---
    "dedup_bloom_frontier_rolling", "dedup_chunks_content_defined",
    "pipeline_shard_assignment", "sketch_hll_rolling_window",
    "split_leakage_audit", "text_bpe_train_merges_batched",
    # --- stale, latest driver row r08 (first 44 of the 47 remaining;
    # the three alphabetical-last rows are displaced by round-0
    # slots) ---
    "anomaly_daily_mad", "basket_lift_pairs", "cdc_merge_upsert",
    "dedup_chunk_signature", "dedup_incremental_batch",
    "dedup_incremental_stored_grams", "dedup_minhash_lsh",
    "dedup_semantic_blocked", "dedup_simhash", "dedup_span_rebuild",
    "embedding_centroids", "graph_bfs_distances",
    "graph_label_propagation", "graph_personalized_pagerank",
    "graph_triangle_count", "histogram_totalprice",
    "inference_scores_batched", "join_tpch_q10_shape",
    "join_tpch_q15_shape", "join_tpch_q19_shape",
    "join_tpch_q3_shape", "join_tpch_q7_shape", "join_tpch_q9_shape",
    "lateral_explode_outer", "map_type_surface",
    "nested_struct_array_agg", "pagination_offset",
    "pii_mask_digits", "pipeline_curation_stats", "profile_columns",
    "sample_hash_pct", "sample_stratified", "set_except_all",
    "similarity_quantized_topk", "skew_join_salted",
    "source_csv_roundtrip", "source_jsonl_events",
    "source_mixing_weights", "source_orc_roundtrip",
    "streaks_gaps_islands", "string_similarity_levenshtein",
    "text_quality_classifier", "text_quality_score",
    "text_token_entropy",
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
