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
# Round-9 policy (VERDICT r08 item 1): the window takes the stale
# tail — all 38 queries whose latest driver row dates from r04, the
# one NEW r9 registration (no driver row at all, so stalest of all),
# plus the 11 alphabetically-first queries from the r05 block to fill
# the 50 slots.  After this round no query's latest driver row
# predates r05, which closes the systematic staleness debt entirely.
#
# Steady-state cadence from r10 on (VERDICT r08 item 7): each round the
# window takes the ~50 queries whose latest driver row is OLDEST,
# breaking ties alphabetically (new registrations have no row and sort
# first).  With 235 registered queries and 50 slots per round, every
# query gets a fresh driver row at least once every ceil(235/50) = 5
# rounds, so freshness debt can never re-accumulate.  Pre-written r10
# window: the 38 remaining r05-row queries (the r05 block minus the 11
# rotated here), then the 12 alphabetically-first r06-row queries.
# Recompute per round as
#   latest[q] = max round over CORRECTNESS_r0*.json containing q;
#   window = sorted(queries, key=(latest[q], q))[:50].
# Machine-checked: tests/test_properties.py::
# test_sample_window_is_the_stalest_fifty recomputes the window from
# the checked-in CORRECTNESS files and fails once a new round's file
# lands — fixing it IS the rotation step.
_SAMPLE_FIRST = (
    # --- stale, latest driver row r04 (all 38) ---
    "corpus_overlap_sources", "dedup_containment_overlap",
    "dedup_minhash_estimate", "dedup_simhash_estimate",
    "dedup_source_stats", "dq_rule_report", "events_markov_transitions",
    "join_tpch_q12_shape", "join_tpch_q14_shape", "join_tpch_q8_shape",
    "json_extract_events", "multimodal_audio_rms",
    "multimodal_decode_png", "multimodal_image_dhash_pairs",
    "pattern_sequence_detect", "pipeline_corpus_build",
    "retrieval_rrf_fusion", "scd2_point_in_time_join",
    "set_intersect_all", "similarity_maxsim_multivector",
    "sketch_countmin_stopwords", "sketch_hll_rollup",
    "source_python_datasource", "split_train_valid_hash",
    "sql_recursive_cte_chain", "subq_tpch_q11_shape",
    "subq_tpch_q16_shape", "subq_tpch_q17_shape", "subq_tpch_q20_shape",
    "subq_tpch_q21_shape", "subq_tpch_q2_shape", "text_chunk_overlap",
    "text_collocations_llr", "text_fingerprint", "text_lang_id",
    "text_tfidf_top3", "timeseries_ewma_daily", "variant_json_surface",
    # --- NEW registration this round (no driver row yet => stalest) ---
    "embedding_outlier_zscore",
    # --- alphabetical head of the r05 block (11 fillers) ---
    "agg_regression_price_qty", "agg_skew_kurtosis", "agg_trimmed_mean",
    "agg_weighted_median", "agg_weighted_median_by_flag",
    "cohort_retention", "corpus_length_quantiles_by_source",
    "corpus_quality_deciles_by_source", "corpus_source_topp",
    "dedup_embedding_lsh", "funnel_conversion",
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
