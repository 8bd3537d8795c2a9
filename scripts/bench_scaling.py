#!/usr/bin/env python3
"""sf0.1 -> sf1 scaling bench for the headline LLM-pipeline queries
(VERDICT r03 item 8): measure each pipeline at sf0.1 and at a 10x
synthetic sf1, and report the scaling exponent
``log10(t_sf1 / t_sf0.1)`` — 1.0 = linear, <1 = sub-linear (fixed
overheads amortizing), >1.1 = super-linear (a shuffle/skew/all-pairs
problem that would sink a 100 TB run).

The sf1 corpus is derived from the driver's sf0.1 fixtures (never
hand-synthesized distributions): 10 replicas with shifted ids, where
replica k>0 prefixes every token with a letters-only tag ``q[a-j]``
(documents — letters because the dedup normalizers strip non-letters,
which would erase a digit tag and collapse the replicas) or applies a
k-dependent sign-flip pattern (embeddings).  This keeps per-doc length /
vocabulary shape / vector norms identical while making replicas
*disjoint* for dedup purposes — otherwise every doc would gain 9
near-duplicates and candidate-pair counts would grow ~45x, measuring
the data's duplication rate rather than the engine's scaling.

Usage: python scripts/bench_scaling.py [--keep] [--runs N]
Writes the JSON result to stdout; the sf1 dir lives under
.bench_sf1/ (removed afterwards unless --keep).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.path.join(_REPO, ".bench_sf1")
REPLICAS = 10

PIPELINES = [
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard_prefix",
    "dedup_embedding_lsh",
    "dedup_semantic_blocked",
    "text_perplexity_buckets",
    "pipeline_sequence_packing",
    "dedup_containment_overlap",
    "corpus_overlap_sources",
    "multimodal_image_dhash_pairs",
    # round-5: the round-4 heavy ops (VERDICT r04 item 6) — these read
    # the relational tables, so events/customer/orders/lineitem are now
    # replicated with consistent FK shifts instead of symlinked
    "retrieval_rrf_fusion",
    "graph_label_propagation",
    "scd2_point_in_time_join",
    "basket_lift_pairs",
    "cdc_merge_upsert",
    # round-5 wave 3: token-stream-heavy keyphrase extraction and the
    # map-only video frame-sampling leg
    "text_keyphrase_rake",
    "multimodal_video_framesample",
    # round-5 wave 4: grouped two-phase ntile, budget resample
    "corpus_quality_deciles_by_source",
    "pipeline_budget_resample",
    # round-5 waves 5-6: weighted SSSP (graph-sized iteration), interval
    # overlap (true pair count grows with session density — honest shape)
    "graph_sssp_weighted",
    "sessions_interval_overlap",
    # round-5 waves 7-8: distributed per-group order statistics, bloom
    # semi-join reduction over the fact table, integer systematic PPS
    "corpus_length_quantiles_by_source",
    "join_bloom_prefilter",
    "sample_weighted_systematic",
    # round-6: global rank stats (the join-back is its one full-width
    # shuffle — VERDICT r05 item 7), k-core peeling, tolerance as-of,
    # salted-top-k hard negatives, BPE pair induction
    "window_global_rank_stats",
    "graph_kcore",
    "asof_join_tolerance",
    "retrieval_hard_negatives",
    "text_bpe_first_merges",
    # round-6 wave 5: ExactSubstr span dedup (window-key shuffle +
    # per-doc merge — the new heavy text op), novelty inverted index
    "dedup_substring_spans",
    "text_ngram_novelty",
    # round-6 wave 6: per-user lead window + path-vocab reduce
    "events_top_paths",
    # round-6 wave 7: covariance partial pass + 256-bin histogram sketch
    "embedding_pca_power",
    "sketch_quantile_histogram",
    # round-6 wave 8: trigram first-doc/per-doc reduces vs 10 boundaries
    "text_heaps_law",
    # round-6 waves 9-10: native session windows; rank-stats Gini
    "window_session_builtin",
    "agg_gini_spend",
    # round-7: the dense-fast-path graph queries (25-node catalog graph
    # at every SF: edge AGGREGATION deepens 10x, iteration state fixed —
    # expect near-flat exponents dominated by the fact-join edge build)
    "graph_hits_trade",
    "graph_pagerank_trade",
    # round-9: diagonal-Mahalanobis embedding outliers (posexplode ->
    # 64-row stats broadcast -> per-vector sum -> TakeOrdered top-20;
    # expect exponent ~linear on the explode, flat reduce state)
    "embedding_outlier_zscore",
    # round-10: URL canonicalization + host-level dedup stats (regex
    # expressions ride the scan; one shuffle carrying ~|hosts| groups'
    # partial aggs — expect near-linear scan term, tiny absolute)
    "dedup_url_canonical",
    # round-10: per-domain cap (WindowGroupLimit pre-trims each map
    # task to K per host before the one exchange — expect flat: the
    # shuffle carries <= K x hosts x tasks rows at any corpus size)
    "curation_domain_cap",
    # round-11: multi-class PII scrub (map-only regexes, zero shuffle —
    # expect near-linear on the scan term, tiny absolute) and BPE token
    # budgeting (line-level subword encode + |sources|-row rollup —
    # near-linear scan term, flat reduce state)
    "pii_scrub_multi",
    "text_token_budget_bpe",
    # round-12: Bloom-prefiltered crawl-frontier URL dedup — expect
    # flat-to-sublinear (stage-chain latency dominates; the ledger
    # shuffle carries distinct URLs, the recheck only survivors) —
    # and empirical-Bayes source priors (in-row logistic + |sources|
    # shuffle — expect near-linear scan term, tiny absolute)
    "dedup_bloom_frontier",
    "curation_source_prior",
    # round-12: full BPE training — expect flat-to-sublinear past the
    # single word-count shuffle (rounds are vocabulary-sized)
    "text_bpe_train_merges",
    # round-13: rolling frontier (per-day bitmaps over 10x events —
    # expect flat-to-sublinear: bitmap partials + broadcast probes;
    # only the sighting-ledger distinct scales), split leakage audit
    # (prefix-filtered pair join dominates — expect the
    # dedup_ngram_jaccard_prefix family exponent), shard assignment
    # (one scan + 16-group partial agg — expect near-linear scan term,
    # tiny absolute)
    "dedup_bloom_frontier_rolling",
    "split_leakage_audit",
    "pipeline_shard_assignment",
    # round-13: rolling HLL sketch-union window (per-day sketches,
    # dimension-sized range merge — expect flat-to-sublinear: only the
    # per-day sketch build and the exact-audit fan-out scale)
    "sketch_hll_rolling_window",
    # round-13: content-defined chunking — expect near-linear (the
    # doc-keyed window pass is the scan term; chunk/source rollups are
    # partial-agged)
    "dedup_chunks_content_defined",
]

PASSTHROUGH = ["region", "nation", "supplier", "part"]

# Relational replication: per-replica id shifts keep FKs consistent
# INSIDE a replica (o_custkey shift == c_custkey shift; l_orderkey ==
# o_orderkey) and replicas disjoint.  part/supplier stay shared — the
# "10x more facts, same catalog" scenario — so catalog-keyed aggregates
# (basket lift, LPA's 25-nation graph) deepen rather than widen, which
# is the honest production shape for them.
REL_SHIFTS = {
    "events": {"event_id": 100_000_000, "user_id": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 1_000_000},
    "lineitem": {"l_orderkey": 100_000_000},
}


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    os.makedirs(SF1_DIR, exist_ok=True)
    for t in PASSTHROUGH:
        dst = os.path.join(SF1_DIR, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)

    for t, shifts in REL_SHIFTS.items():
        dst = os.path.join(SF1_DIR, f"{t}.parquet")
        if os.path.islink(dst):  # stale symlink from a pre-r5 --keep run:
            os.remove(dst)       # never write through into the fixtures
        base = spark.read.parquet(os.path.join(SRC, f"{t}.parquet"))
        parts = []
        for k in range(REPLICAS):
            d = base
            for col, step in shifts.items():
                d = d.withColumn(col, F.col(col) + F.lit(k * step))
            parts.append(d)
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        out.repartition(32).write.mode("overwrite").parquet(
            os.path.join(SF1_DIR, f"{t}.parquet"))

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    parts = []
    for k in range(REPLICAS):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(k * 100_000_000))
        if k:
            # LETTERS-ONLY replica tag: dedup normalizers strip
            # [^A-Za-z ], so a digit tag (the old q{k}) vanished and all
            # replicas collapsed onto the same normalized vocabulary —
            # every doc gained 9 near-duplicates and the r6 ngram run
            # measured the fixture's duplication blow-up (256 ->
            # 200,992 output pairs), not the engine's scaling.
            tag = "q" + "abcdefghij"[k]
            d = d.withColumn(
                "text", F.regexp_replace("text", "([A-Za-z]+)", f"{tag}$1"))
        parts.append(d)
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SRC, "embeddings.parquet"))
    parts = []
    for k in range(REPLICAS):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(k * 100_000_000))
        if k:
            def _flip(_k):
                return F.transform(
                    "embedding",
                    lambda x, i: F.when((i * (_k + 3)) % 3 == 0, -x).otherwise(x))
            e = e.withColumn("embedding", _flip(k))
        parts.append(e)
    out = parts[0]
    for e in parts[1:]:
        out = out.unionByName(e)
    out.repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1_DIR, "embeddings.parquet"))


def bench(spark, specs, sf_dir: str, runs: int) -> dict[str, float]:
    from mapreduce_implementation_spark.operators.caching import release_persisted

    out: dict[str, float] = {}
    for name in PIPELINES:
        rr = []
        for _ in range(runs):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            rr.append(round(time.perf_counter() - t0, 3))
            release_persisted()
        out[name] = min(rr[1:]) if len(rr) > 1 else rr[0]  # min-of-warm
    return out


def main() -> None:
    keep = "--keep" in sys.argv
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1])
        if a.startswith("--only="):
            sel = a.split("=", 1)[1].split(",")
            unknown = [n for n in sel if n not in PIPELINES]
            assert not unknown, f"not in PIPELINES: {unknown}"
            PIPELINES[:] = sel

    from mapreduce_implementation_spark.registry import all_specs
    from mapreduce_implementation_spark.session import get_spark

    spark = get_spark("bench_scaling")
    specs = all_specs()
    build_sf1(spark)

    small = bench(spark, specs, SRC, runs)
    large = bench(spark, specs, SF1_DIR, runs)
    exponents = {
        n: round(math.log10(max(large[n], 1e-3) / max(small[n], 1e-3)), 3)
        for n in PIPELINES
    }
    print(json.dumps({
        "sf_small": SRC, "sf_large": f"{SF1_DIR} (10x replicated, disjoint)",
        "runs_per_point": runs, "headline_is": "min_of_warm",
        "sec_sf0_1": small, "sec_sf1": large,
        "scaling_exponent_log10_ratio": exponents,
    }, indent=1))

    if not keep:
        shutil.rmtree(SF1_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
