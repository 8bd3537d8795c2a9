#!/usr/bin/env python3
"""Dump .explain('formatted') for the given queries to
plans/r14/<query>_<suffix>.txt (suffix = argv[1], e.g. before/after).

    python scripts/dump_plans.py before q1 q2 ...
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_implementation_spark.operators.caching import (  # noqa: E402
    release_persisted,
)
from mapreduce_implementation_spark.registry import all_specs  # noqa: E402
from mapreduce_implementation_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_plans")
    specs = all_specs()
    for name in names:
        df = specs[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        release_persisted()
        print(name, "->", f"{name}_{suffix}.txt")


if __name__ == "__main__":
    main()
