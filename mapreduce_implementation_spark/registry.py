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
# r12 window: CORRECTNESS_r11 landed 50/50 green (all full hash
# matches), exactly as pre-computed last round, so the 3 r11
# _CHANGED_IN_ROUND entries (asof_join_tolerance, dedup_url_canonical,
# embedding_pca_power — all r11-green) are pruned.  The window is
# 4 round-0 slots (the new dedup_bloom_frontier,
# curation_source_prior and text_bpe_train_merges registrations + the
# changed pii_scrub_multi, flagged below) + the 43 remaining r07-row
# queries (dedup_cluster_representatives .. word_count) + the 3
# alphabetically-first r08-row queries (agg_approx_stats ..
# agg_tpch_q6_forecast) — i.e. the r11 pre-computation with the 4
# round-0 slots displacing the last four r08 fillers
# (anomaly_daily_mad, basket_lift_pairs, cdc_merge_upsert,
# dedup_chunk_signature).  (dedup_url_canonical's r12 refactor is
# pure code motion of its URL-synthesis expression into _synth_url —
# analyzed plan byte-identical, machine-compared — so per the
# mechanical-refactor convention above it does NOT flag; the same
# holds for bloom_prefilter's bitmap-build/probe extraction, machine-
# compared via join_bloom_prefilter's analyzed plan.)
#
# Pre-computed r13 window (assuming CORRECTNESS_r12 lands with the 50
# below and r13 makes no new registrations / change flags): the 47
# remaining r08-row queries (anomaly_daily_mad ..
# unpivot_lineitem_measures) + the 3 alphabetically-first r09-row
# queries (agg_regression_price_qty .. agg_trimmed_mean).  The guard
# test recomputes the truth either way — a head start, not an answer.
_CHANGED_IN_ROUND: dict[str, int] = {
    # r12: two new scrub classes (IPv6, Luhn-gated cards) extend the
    # fixed-order contract — output changed on both sides (new columns
    # n_ipv6/n_card/n_card_valid, scrub_md5 now pins the 5-stage text)
    "pii_scrub_multi": 12,
}

_SAMPLE_FIRST = (
    # --- round-0 stale: new registrations + changed-this-round ---
    "curation_source_prior", "dedup_bloom_frontier", "pii_scrub_multi",
    "text_bpe_train_merges",
    # --- stale, latest driver row r07 (all 43 remaining) ---
    "dedup_cluster_representatives", "dedup_clusters",
    "dedup_embedding_cosine", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_prefix", "dedup_semantic_kmeans",
    "dedup_tfidf_cosine", "distinct_rows", "distributed_sort",
    "distributed_sort_desc", "grouping_sets_sql", "join_anti",
    "join_broadcast_dims", "join_full_outer", "join_left_outer",
    "join_semi", "join_shuffle_facts", "join_tpch_q5_shape",
    "multimodal_binary_meta", "multimodal_decode_stub",
    "null_handling", "partitioned_scan_events_week",
    "pivot_linestatus", "range_join_sessions", "rollup_agg",
    "scalar_date_functions", "scalar_string_math",
    "sessionize_events", "set_except", "set_intersect",
    "set_union_distinct", "similarity_cosine_topk",
    "sql_correlated_subquery", "stats_chi2_event_dow",
    "stream_join_attribution", "tokenize", "top_k",
    "union_all_counts", "window_first_last",
    "window_sliding_events", "window_tumbling_events", "word_count",
    # --- alphabetical head of the r08 block (3 fillers) ---
    "agg_approx_stats", "agg_hll_distinct", "agg_tpch_q6_forecast",
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
