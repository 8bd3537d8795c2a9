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
# r11 window (final form, after the round's registrations and flags):
# 5 round-0-stale slots (2 new registrations pii_scrub_multi /
# text_token_budget_bpe + 3 change-flagged below — note
# embedding_pca_power sits in the r06 tuple section below but its flag
# makes it round-0 under eff(), so the recomputed buckets read
# 5 / 40 / 5) + 40 remaining r06-row queries + the 5 alphabetically-
# first r07-row queries (agg_decimal_exact .. anomaly_daily_zscore).
# The r10 pre-computation (41 r06 + 9 r07 fillers ending at
# dedup_exact) held until the new registrations displaced the last 4
# r07 fillers.  The 4 r10 _CHANGED_IN_ROUND entries all received their
# r10 driver rows (green) and are pruned.
#
# Pre-computed r12 window (assuming CORRECTNESS_r11 lands with the 50
# below and r12 makes no new registrations / change flags): the 43
# remaining r07-row queries (dedup_cluster_representatives ..
# word_count — word_count sorts AFTER window_running_sum; r11 review
# caught the tail misnamed) + the 7 alphabetically-first r08-row
# queries (agg_approx_stats .. dedup_chunk_signature).  The guard test
# recomputes the truth either way — a head start, not an answer.
_CHANGED_IN_ROUND: dict[str, int] = {
    # r11: asof_join_windowed changed — null-keyed LEFT rows now route
    # around the window via a pad Union leg (skew fix), and the tie-
    # break ORDER key NaN-normalizes float payload fields — the
    # operator behind this query changed, so it re-verifies this round
    "asof_join_tolerance": 11,
    # r11: urlfn userinfo strip (r10 ADVICE) + a userinfo mess class in
    # the synthesized URL surface — output changed on both sides
    "dedup_url_canonical": 11,
    # r11: power-iteration rounds 5 -> 40 (the numpy.linalg.eigh
    # reference test caught 5 rounds stopping at ~85% of lambda1 on the
    # near-isotropic fixture spectrum) — output changed on both sides.
    # Already in the r11 window via its stale r06 row, so the set is
    # unchanged; the flag records WHY its r11 driver row must be green
    # against the new output.
    "embedding_pca_power": 11,
}

_SAMPLE_FIRST = (
    # --- round-0 stale: new registrations + changed-this-round ---
    "asof_join_tolerance", "dedup_url_canonical", "pii_scrub_multi",
    "text_token_budget_bpe",
    # --- stale, latest driver row r06 (all 41 remaining) ---
    "agg_tpch_q1", "array_functions", "corpus_datasheet", "cube_agg",
    "date_arithmetic", "dedup_substring_spans", "embedding_dim_stats",
    "embedding_pca_power", "embedding_random_projection",
    "events_new_vs_returning", "events_top_paths", "graph_hits_trade",
    "graph_kcore", "incremental_agg_merge", "join_band_broadcast",
    "join_null_safe", "layout_zorder_key", "multimodal_audio_vad_spans",
    "multimodal_image_resize", "pipeline_filter_funnel",
    "pipeline_sequence_packing", "retrieval_hard_negatives",
    "scalar_try_functions", "scalar_url_functions",
    "sketch_hll_datasketches", "sketch_quantile_histogram",
    "skyline_pareto_orders", "source_schema_evolution",
    "sql_lateral_topn", "stats_ks_two_sample", "text_bpe_first_merges",
    "text_heaps_law", "text_js_divergence_sources",
    "text_ngram_novelty", "timeseries_cumulative_users",
    "timeseries_cusum_changepoint", "timeseries_holt_linear",
    "timeseries_wau_sliding", "window_global_rank_stats",
    "window_range_trailing_7d", "window_session_builtin",
    # --- alphabetical head of the r07 block (5 fillers) ---
    "agg_decimal_exact", "agg_mode_per_group", "agg_percentiles_exact",
    "agg_stat_moments", "anomaly_daily_zscore",
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
