#!/usr/bin/env python3
"""Two-decade scaling bench (r12 VERDICT item 4): sf0.1 -> sf1 -> sf10
for the three highest-exponent pipelines from the 10x ledger
(curation_source_prior 0.75, text_perplexity_buckets 0.44,
text_token_budget_bpe 0.27).  The 10x ledger proves sublinearity over
one decade; spill behavior and broadcast-threshold flips live in the
next one — this measures whether the exponent BENDS between decades.

Replica protocol is bench_scaling.py's, extended to 100 replicas: all
three pipelines read only the documents table, so only documents is
replicated (letters-only two-char replica tags q[a-j][a-j] — the dedup
normalizers strip non-letters, same reasoning as the 10x script); the
other tables are symlinked.  doc_id shift 10^8 per replica keeps ids
disjoint.

Usage: python scripts/bench_scaling_100x.py [--keep] [--runs N]
Prints one JSON blob; dirs live under .bench_sf1_3q/ and .bench_sf10/
(removed afterwards unless --keep).
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
SF1_DIR = os.path.join(_REPO, ".bench_sf1_3q")
SF10_DIR = os.path.join(_REPO, ".bench_sf10")

PIPELINES = [
    "curation_source_prior",
    "text_perplexity_buckets",
    "text_token_budget_bpe",
]

OTHER_TABLES = ["region", "nation", "customer", "supplier", "part",
                "orders", "lineitem", "events", "embeddings"]


def build_docs_replicas(spark, dst_dir: str, replicas: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(dst_dir, exist_ok=True)
    for t in OTHER_TABLES:
        dst = os.path.join(dst_dir, f"{t}.parquet")
        if not os.path.lexists(dst):
            os.symlink(os.path.join(SRC, f"{t}.parquet"), dst)

    docs = spark.read.parquet(os.path.join(SRC, "documents.parquet"))
    letters = "abcdefghij"
    parts = []
    for k in range(replicas):
        d = docs.withColumn("doc_id",
                            F.col("doc_id") + F.lit(k * 100_000_000))
        if k:
            tag = "q" + letters[k // 10] + letters[k % 10]
            d = d.withColumn(
                "text", F.regexp_replace("text", "([A-Za-z]+)", f"{tag}$1"))
        parts.append(d)
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    out.repartition(64).write.mode("overwrite").parquet(
        os.path.join(dst_dir, "documents.parquet"))


def bench(spark, specs, sf_dir: str, runs: int) -> dict[str, float]:
    from mapreduce_implementation_spark.operators.caching import (
        release_persisted,
    )

    out: dict[str, float] = {}
    for name in PIPELINES:
        rr = []
        for _ in range(runs):
            t0 = time.perf_counter()
            specs[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            rr.append(round(time.perf_counter() - t0, 3))
            release_persisted()
        out[name] = min(rr[1:]) if len(rr) > 1 else rr[0]
    return out


def main() -> None:
    # Strict argv handling (r13 ADVICE: `--runs 5` used to silently run
    # with the default 3): both `--runs=N` and `--runs N` accepted;
    # anything unrecognized is a hard error, never ignored.
    keep, runs = False, 3
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--keep":
            keep = True
        elif a.startswith("--runs="):
            runs = int(a.split("=", 1)[1])
        elif a == "--runs":
            if i + 1 >= len(args):
                sys.exit("--runs requires a value")
            i += 1
            runs = int(args[i])
        else:
            sys.exit(f"unrecognized argument: {a!r} "
                     "(usage: [--keep] [--runs N | --runs=N])")
        i += 1

    from mapreduce_implementation_spark.registry import all_specs
    from mapreduce_implementation_spark.session import get_spark

    spark = get_spark("bench_scaling_100x")
    specs = all_specs()
    build_docs_replicas(spark, SF1_DIR, 10)
    build_docs_replicas(spark, SF10_DIR, 100)

    t01 = bench(spark, specs, SRC, runs)
    t1 = bench(spark, specs, SF1_DIR, runs)
    t10 = bench(spark, specs, SF10_DIR, runs)
    exps = {
        n: {
            "sf0.1_s": t01[n], "sf1_s": t1[n], "sf10_s": t10[n],
            "exp_decade1": round(
                math.log10(max(t1[n], 1e-3) / max(t01[n], 1e-3)), 3),
            "exp_decade2": round(
                math.log10(max(t10[n], 1e-3) / max(t1[n], 1e-3)), 3),
        }
        for n in PIPELINES
    }
    print(json.dumps({
        "protocol": "min_of_warm of %d, local[32], disjoint replicas" % runs,
        "decades": "sf0.1 -> sf1 (10x docs) -> sf10 (100x docs)",
        "results": exps,
    }, indent=1))

    if not keep:
        shutil.rmtree(SF1_DIR, ignore_errors=True)
        shutil.rmtree(SF10_DIR, ignore_errors=True)


if __name__ == "__main__":
    main()
