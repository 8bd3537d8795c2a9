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
# first).  With ~236 registered queries and 50 slots per round, every
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
# r10 window: 2 new registrations + 4 changed-this-round + the 38
# remaining r05-row queries + the 6 alphabetically-first r06-row
# queries.
#
# Pre-computed r11 window (assuming CORRECTNESS_r10 lands with the 50
# above and r11 makes no new registrations / change flags): the 41
# remaining r06-row queries + the 9 alphabetically-first r07-row
# queries (agg_decimal_exact .. dedup_exact).  The guard test
# recomputes the truth either way — treat this as a head start, not
# an answer.
_CHANGED_IN_ROUND: dict[str, int] = {
    # r10: z2 recomputed from an exact decimal(28,6) intermediate
    # (r9 ADVICE rounding-boundary fix) — output expression changed
    "embedding_outlier_zscore": 10,
    # r10: asof_join_windowed hardened (NULL by/on-keys match nothing,
    # by-key dtype normalization, uniquified temp names, struct-bundled
    # payload) — the operator this query is registered on changed
    "asof_join_tolerance": 10,
    # r10: asof_join (cogroup) changed behavior too — deterministic
    # tie ordering on tied right timestamps, NULL on-key routing — so
    # its registered consumers re-verify this round as well
    "asof_join_latest_order": 10,
    "scd2_point_in_time_join": 10,
}

_SAMPLE_FIRST = (
    # --- round-0 stale: new registrations + changed-this-round ---
    "asof_join_latest_order", "asof_join_tolerance",
    "curation_domain_cap", "dedup_url_canonical",
    "embedding_outlier_zscore", "scd2_point_in_time_join",
    # --- stale, latest driver row r05 (all 38 remaining) ---
    "graph_pagerank_trade", "graph_sssp_weighted", "join_bloom_prefilter",
    "multimodal_video_framesample", "pandas_udaf_rms_spend",
    "pandas_udf_charge", "pipeline_budget_resample",
    "pipeline_fingerprint_dedup", "rfm_segments",
    "sample_weighted_systematic", "scd2_intervals",
    "sessions_interval_overlap", "similarity_ann_ivf",
    "similarity_ann_lsh", "sort_nulls_ordering", "subq_custdist",
    "subq_exists_late_ship", "subq_in_large_orders",
    "subq_scalar_anti_q22", "text_bigram_logprob", "text_bm25_top10",
    "text_contamination_4gram", "text_dedup_exact_normalized",
    "text_keyphrase_rake", "text_perplexity_buckets", "text_pmi_pairs",
    "text_repetition_gopher", "text_zipf_alpha", "timeseries_gap_fill",
    "udtf_order_years", "window_global_ntile", "window_lag_lead",
    "window_moving_avg", "window_percent_rank_cume",
    "window_range_frame", "window_rank", "window_row_number_topk",
    "window_running_sum",
    # --- alphabetical head of the r06 block (6 fillers) ---
    "agg_conditional_filter", "agg_geometric_harmonic_means",
    "agg_gini_spend", "agg_minmax_multi_key",
    "agg_ols_normal_equations", "agg_percentiles",
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
