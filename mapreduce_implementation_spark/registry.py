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
# r14 window: CORRECTNESS_r13 landed 50/50 green (all full hash
# matches).  Recomputed from the checked-in CORRECTNESS files (the
# r13 prediction comment was WRONG — it said "10 r09 + 40 r10"; the
# truth, machine-recomputed and judge-confirmed in VERDICT r13, is):
# the 3 displaced r08-row queries (text_token_stats,
# text_top_terms_per_lang, unpivot_lineitem_measures) + the first 47
# r09-row queries alphabetically (agg_regression_price_qty ..
# timeseries_ewma_daily).  New r14 registrations slot in as round-0
# entries at the front, displacing the alphabetical tail.
#
# Pre-computed r15 window (assuming CORRECTNESS_r14 lands with the 50
# below): the 17 remaining r09-row queries (the 10 never in an r14
# slot + the 7 the round-0 entries displaced: subq_tpch_q2_shape,
# text_chunk_overlap, text_collocations_llr, text_fingerprint,
# text_lang_id, text_tfidf_top3, timeseries_ewma_daily) + the first
# 33 r10-row queries alphabetically, minus one tail slot per new r15
# registration/change flag.  The guard test recomputes the truth
# either way — a head start, NOT an answer; trust only the
# recomputation.
_CHANGED_IN_ROUND: dict[str, int] = {
    # New r14 registrations have no driver row and enter as round-0
    # via _SAMPLE_FIRST ordering (a _CHANGED_IN_ROUND entry would be
    # redundant: latest[q] is already unset).
    # r13 ADVICE (medium) fix: the sketch-merge leg is now keyed on
    # the fan-out day set so gap days survive — a plan/behavior
    # change over its r13-green row.
    "sketch_hll_rolling_window": 14,
    # r13 VERDICT item 3: staged 14-pass regex ladder merged into one
    # combined-alternation pass (SQL-text expressions) — same oracle,
    # new plan, over its r12-green row.
    "pii_scrub_multi": 14,
    # r13 VERDICT item 4: the batched trainer gained multi-merge
    # batching; the registered m=1 path now runs the fused-scan apply
    # (parity-pinned, but changed code) — over its r13-green row.
    "text_bpe_train_merges_batched": 14,
}

_SAMPLE_FIRST = (
    # --- round-0: new registration this round ---
    "dedup_cdc_duplicate_mass", "retrieval_eval_ndcg",
    "stats_bootstrap_ci", "stats_psi_drift",
    # --- round-0: registration changed since its last driver row ---
    "pii_scrub_multi", "sketch_hll_rolling_window",
    "text_bpe_train_merges_batched",
    # --- stale, latest driver row r08 (the 3 rows displaced from the
    # r13 window by that round's round-0 registrations) ---
    "text_token_stats", "text_top_terms_per_lang",
    "unpivot_lineitem_measures",
    # --- stale, latest driver row r09 (alphabetical prefix; each
    # round-0 slot above displaces one from this tail) ---
    "agg_regression_price_qty", "agg_skew_kurtosis",
    "agg_trimmed_mean", "agg_weighted_median",
    "agg_weighted_median_by_flag", "cohort_retention",
    "corpus_length_quantiles_by_source", "corpus_overlap_sources",
    "corpus_quality_deciles_by_source", "corpus_source_topp",
    "dedup_containment_overlap", "dedup_embedding_lsh",
    "dedup_minhash_estimate", "dedup_simhash_estimate",
    "dedup_source_stats", "dq_rule_report",
    "events_markov_transitions", "funnel_conversion",
    "join_tpch_q12_shape", "join_tpch_q14_shape",
    "join_tpch_q8_shape", "json_extract_events",
    "multimodal_audio_rms", "multimodal_decode_png",
    "multimodal_image_dhash_pairs", "pattern_sequence_detect",
    "pipeline_corpus_build", "retrieval_rrf_fusion",
    "set_intersect_all", "similarity_maxsim_multivector",
    "sketch_countmin_stopwords", "sketch_hll_rollup",
    "source_python_datasource", "split_train_valid_hash",
    "sql_recursive_cte_chain", "subq_tpch_q11_shape",
    "subq_tpch_q16_shape", "subq_tpch_q17_shape",
    "subq_tpch_q20_shape", "subq_tpch_q21_shape",
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
