#!/usr/bin/env python3
"""Replay the driver's correctness loop in registry order.

Round 1's driver run died mid-loop (a stochastic local-mode task failure
aborted the job ~50 queries in) and 13 registered queries never got a
CORRECTNESS row.  This script reproduces that loop — same order, same
comparison (row count + column names + order-insensitive value canon) —
with per-query isolation so one failure cannot hide the rest, and prints
one JSON object shaped like CORRECTNESS_r{N}.json.

Usage:  python scripts/replay_correctness.py [sf_dir] [--names a,b,c]
Default sf_dir: /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = None
    for a in sys.argv[1:]:
        if a.startswith("--names="):
            only = set(a.split("=", 1)[1].split(","))

    from _oracle import _canon_rows, duck_connect

    from mapreduce_implementation_spark.registry import all_specs
    from mapreduce_implementation_spark.session import get_spark

    spark = get_spark("replay_correctness")
    con = duck_connect(sf_dir)
    specs = all_specs()

    results: dict[str, dict] = {}
    for name, spec in specs.items():
        if only and name not in only:
            continue
        rec: dict = {"rows_match": None, "schema_match": None, "hash_match": None,
                     "spark_rows": None, "oracle_rows": None, "err": None, "sec": None}
        t0 = time.perf_counter()
        try:
            df = spec.fn(spark, sf_dir)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(spark_rows)
            if spec.oracle is None:
                rec["err"] = "no_oracle"
            else:
                res = con.execute(spec.oracle)
                duck_cols = [d[0] for d in res.description]
                duck_rows = res.fetchall()
                rec["oracle_rows"] = len(duck_rows)
                rec["rows_match"] = len(spark_rows) == len(duck_rows)
                rec["schema_match"] = sorted(spark_cols) == sorted(duck_cols)
                rec["hash_match"] = (
                    rec["rows_match"] and rec["schema_match"] and
                    _canon_rows(spark_rows, spark_cols) == _canon_rows(duck_rows, duck_cols)
                )
        except Exception:
            rec["err"] = traceback.format_exc(limit=3)
        rec["sec"] = round(time.perf_counter() - t0, 3)
        results[name] = rec
        ok = rec["hash_match"] if rec["err"] is None else rec["err"].strip().splitlines()[-1][:80]
        print(f"  {name}: {ok} ({rec['sec']}s)", file=sys.stderr)

    n_pass = sum(1 for r in results.values() if r["hash_match"])
    n_noor = sum(1 for r in results.values() if r["err"] == "no_oracle")
    n_fail = len(results) - n_pass - n_noor
    print(json.dumps(results, indent=1))
    print(f"# {n_pass} hash-pass / {n_noor} no_oracle / {n_fail} FAIL "
          f"of {len(results)}", file=sys.stderr)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
