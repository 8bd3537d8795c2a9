#!/usr/bin/env python3
"""Decompose each headline query's wall-clock into
(a) DataFrame CONSTRUCTION (py4j expression-tree build),
(b) ANALYSIS (df.schema — resolves the logical plan),
(c) EXECUTION (noop sink, min of 2 warm runs after 1 warm-up).

The bench times (a)+(b)+(c) together per run; this script says which
of the three to optimize per query.  Usage:

    python scripts/profile_build_vs_exec.py [query ...]

No args = the full bench HEADLINE list.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _materialize  # noqa: E402

from mapreduce_implementation_spark.operators.caching import (  # noqa: E402
    release_persisted,
)
from mapreduce_implementation_spark.registry import all_specs  # noqa: E402
from mapreduce_implementation_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile")
    specs = all_specs()
    names = sys.argv[1:] or HEADLINE

    # session warmup (same shapes as bench.py)
    from pyspark.sql import functions as F
    warm = (
        spark.range(0, 10_000)
        .select(F.concat(F.lit("w x9 "), F.col("id").cast("string")).alias("t"))
        .select(F.explode(F.split(F.lower(F.regexp_replace("t", "[^A-Za-z ]", "")), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w").count()
    )
    _materialize(warm)
    _materialize(specs["word_count"].fn(spark, sf_dir))
    release_persisted()

    print(f"{'query':40s} {'build':>7s} {'analyz':>7s} {'exec_w':>7s} {'total':>7s}")
    rows = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        # run 0: warm-up (absorbs per-shape JIT); runs 1-2: measured
        builds, anas, execs = [], [], []
        for _ in range(3):
            t0 = time.perf_counter()
            df = specs[name].fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.schema  # force analysis
            t2 = time.perf_counter()
            _materialize(df)
            t3 = time.perf_counter()
            release_persisted()
            builds.append(t1 - t0)
            anas.append(t2 - t1)
            execs.append(t3 - t2)
        b, a, e = min(builds[1:]), min(anas[1:]), min(execs[1:])
        rows.append((name, b, a, e))
        print(f"{name:40s} {b:7.3f} {a:7.3f} {e:7.3f} {b + a + e:7.3f}",
              flush=True)
    tot_b = sum(r[1] for r in rows)
    tot_a = sum(r[2] for r in rows)
    tot_e = sum(r[3] for r in rows)
    print(f"{'TOTAL':40s} {tot_b:7.3f} {tot_a:7.3f} {tot_e:7.3f} "
          f"{tot_b + tot_a + tot_e:7.3f}")


if __name__ == "__main__":
    main()
