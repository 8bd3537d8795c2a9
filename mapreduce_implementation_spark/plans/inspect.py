"""Physical-plan inspection — the 100 TB discipline, enforceable in tests.

The reference has no optimizer (SURVEY.md §4); on Spark the optimizer is
the engine, so the engine's job is to KEEP the good plan: these helpers
assert that a DataFrame's physical plan broadcasts what must broadcast,
prunes what must prune, pushes filters into the parquet scan, runs
partial (map-side) aggregation, and uses TakeOrderedAndProject for
top-k.  A silent regression to SortMergeJoin-everything or
read-all-columns is exactly the class of bug that only shows up at
scale — cheap to pin here.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "plan_string", "assert_broadcast_join", "assert_partial_aggregate",
    "assert_partition_pruning", "assert_pushed_filter",
    "assert_read_schema_only", "assert_take_ordered",
]


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what ``df.explain(mode)`` prints)."""
    jqe = df._jdf.queryExecution()
    try:
        jvm = df.sparkSession._jvm
        return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(jqe, mode)
    except Exception:  # pragma: no cover - fallback for API drift
        return jqe.toString()


def assert_broadcast_join(df: DataFrame, forbid_sort_merge: bool = False) -> None:
    plan = plan_string(df)
    assert "BroadcastHashJoin" in plan, f"no broadcast join in plan:\n{plan}"
    if forbid_sort_merge:
        assert "SortMergeJoin" not in plan, f"unexpected SortMergeJoin:\n{plan}"


def assert_partial_aggregate(df: DataFrame) -> None:
    """Map-side combine present: >=2 HashAggregate nodes (partial+final) —
    the improvement the reference lacks (it shuffles one record per
    occurrence, mapreduce.c:129)."""
    plan = plan_string(df)
    n = len(re.findall(r"HashAggregate", plan))
    assert n >= 2, f"expected partial+final HashAggregate, found {n}:\n{plan}"


def assert_pushed_filter(df: DataFrame, fragment: str) -> None:
    """``fragment`` appears in the scan's PushedFilters list."""
    plan = plan_string(df)
    pushed = re.findall(r"PushedFilters: \[(.*?)\]", plan)
    assert any(fragment in p for p in pushed), (
        f"filter '{fragment}' not pushed to scan; PushedFilters={pushed}"
    )


def assert_partition_pruning(df: DataFrame, fragment: str) -> None:
    """``fragment`` appears in the scan's PartitionFilters — the filter
    prunes whole partition directories instead of scanning 100 TB and
    filtering rows."""
    plan = plan_string(df)
    pruned = re.findall(r"PartitionFilters: \[(.*?)\]", plan)
    assert any(fragment in p for p in pruned), (
        f"filter '{fragment}' not in PartitionFilters; found={pruned}"
    )


def assert_read_schema_only(df: DataFrame, cols: set[str]) -> None:
    """Every parquet scan reads a subset of ``cols`` (column pruning)."""
    plan = plan_string(df)
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        read = {c.split(":")[0].strip() for c in m.split(",") if c.strip()}
        assert read <= cols, f"scan reads {read - cols} beyond expected {cols}"


def assert_take_ordered(df: DataFrame) -> None:
    """Top-k compiles to TakeOrderedAndProject (never a global sort)."""
    plan = plan_string(df)
    assert "TakeOrderedAndProject" in plan, f"no TakeOrderedAndProject:\n{plan}"
