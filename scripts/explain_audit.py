#!/usr/bin/env python3
"""Plan-shape audit across the whole registry: for every registered
query, count shuffle Exchanges and BroadcastExchanges in the executed
plan and list the worst offenders.  A new query that accidentally
introduces an unpartial-aggregated shuffle, a missing broadcast, or a
cartesian blowup shows up here before it shows up at 100 TB.

Usage: python scripts/explain_audit.py [sf_dir] [top_n]
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 30

    from mapreduce_implementation_spark.registry import all_specs
    from mapreduce_implementation_spark.session import get_spark

    spark = get_spark(app_name="explain_audit")
    spark.sparkContext.setLogLevel("OFF")
    rows = []
    for name, spec in all_specs().items():
        try:
            df = spec.fn(spark, sf_dir)
            p = df._jdf.queryExecution().executedPlan().toString()
            rows.append((
                p.count("Exchange hashpartitioning")
                + p.count("Exchange rangepartitioning")
                + p.count("Exchange SinglePartition"),
                p.count("BroadcastExchange"),
                "CARTESIAN" if "CartesianProduct" in p else "",
                name,
            ))
        except Exception as ex:  # noqa: BLE001 - audit must not die mid-sweep
            rows.append((-1, -1, f"ERR {str(ex)[:80]}", name))
    rows.sort(reverse=True)
    print(f"{'shuffles':>8} {'bcast':>5}  query")
    for ex, b, flag, n in rows[:top_n]:
        print(f"{ex:8d} {b:5d}  {n} {flag}")
    errs = [r for r in rows if r[0] < 0]
    if errs:
        print(f"\n{len(errs)} ERRORS:")
        for _, _, flag, n in errs:
            print(" ", n, flag)
        sys.exit(1)


if __name__ == "__main__":
    main()
