"""Relational core: aggregation, top-k, set ops, multi-dim grouping.

Generalizes the reference's single hash-aggregate (O8, mapreduce.c:176-218
— COUNT per word) to the full agg surface, and its global sort + merge
(O10/O11) to top-k.  All declarative: Catalyst plans partial+final
HashAggregateExec (map-side combine the reference lacks), and
``orderBy().limit()`` becomes TakeOrderedAndProject — no global sort is
ever materialized for a top-k at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_aggregate", "top_k", "union_all", "union_distinct",
    "intersect_distinct", "except_distinct", "rollup_agg", "cube_agg",
    "pivot_agg", "merge_upsert",
]


def hash_aggregate(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    """groupBy(keys).agg(aggs) — one shuffle on the grouping keys (O5+O8)."""
    return df.groupBy(*keys).agg(*aggs)


def top_k(df: DataFrame, order: list[Column], k: int) -> DataFrame:
    """Global top-k (O10 + limit): TakeOrderedAndProject physical op —
    per-partition heap of k then driver merge of k*num_partitions rows,
    never a full global sort."""
    return df.orderBy(*order).limit(k)


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def union_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def intersect_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def except_distinct(a: DataFrame, b: DataFrame) -> DataFrame:
    """SQL EXCEPT: distinct rows of ``a`` absent from ``b`` (NOT
    exceptAll+distinct, which keeps rows whose left multiplicity merely
    exceeds the right)."""
    return a.subtract(b)


def rollup_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.rollup(*keys).agg(*aggs)


def cube_agg(df: DataFrame, keys: list[str], aggs: list[Column]) -> DataFrame:
    return df.cube(*keys).agg(*aggs)


def pivot_agg(df: DataFrame, key: str, pivot_col: str, values: list[str],
              agg: Column) -> DataFrame:
    """Pivot with an explicit value list — mandatory at scale (without it
    Spark runs an extra distinct job over the pivot column)."""
    return df.groupBy(key).pivot(pivot_col, values).agg(agg)


def merge_upsert(snapshot: DataFrame, changes: DataFrame, keys: list[str],
                 op_col: str = "op", seq_col: str | None = None) -> DataFrame:
    """CDC MERGE: apply an insert/update/delete change batch to a snapshot.

    ``changes`` carries the snapshot's data columns plus ``op_col``
    ('I'/'U'/'D') and optionally ``seq_col`` (change-log order).  The
    latest change per key wins; 'D' removes the key, anything else
    replaces or creates the full row — the Delta/Iceberg MERGE INTO
    semantics on plain DataFrames (dedup-then-anti-join-then-union is
    exactly how those table formats rewrite non-matching files).

    Without ``seq_col`` there is no change-log order to arbitrate
    duplicate keys within the batch (the normal CDC case), so "latest
    wins" is undefined: the batch is REQUIRED to hold at most one change
    per key and that contract is ENFORCED in-plan — a duplicate key
    poisons every output column of the affected key to NULL via a
    count-over-key guard and ``assert_true``, failing the job with a
    clear message instead of silently emitting duplicate-key rows in
    nondeterministic order.  (The guard is a second window over the same
    key exchange — no extra shuffle.)

    Scale: latest-per-key is a keyed window over the CHANGE BATCH only
    (typically ≪ snapshot); the snapshot itself flows through one
    left-anti hash join on the key and is never widened or re-sorted —
    unchanged rows stream straight to the sink.  With both sides
    bucketed by the key the anti join is also shuffle-free.
    """
    from pyspark.sql.window import Window

    from .joins import _fresh_name

    data_cols = list(snapshot.columns)
    ch = changes
    if seq_col is not None:
        rn = _fresh_name("_rn", changes, snapshot)
        w = Window.partitionBy(*keys).orderBy(F.desc(seq_col))
        ch = (ch.withColumn(rn, F.row_number().over(w))
                .filter(F.col(rn) == 1).drop(rn))
    else:
        dup = _fresh_name("_dupchk", changes, snapshot)
        wc = Window.partitionBy(*keys)
        guard = F.assert_true(
            F.count(F.lit(1)).over(wc) == 1,
            F.lit("merge_upsert: duplicate keys in change batch but no "
                  "seq_col to order them — pass seq_col"))
        # assert_true yields NULL on success and raises on violation; the
        # filter keeps the guard column referenced so pruning can't drop it
        ch = (ch.withColumn(dup, guard)
                .filter(F.col(dup).isNull())
                .drop(dup))
    kept = snapshot.join(ch.select(*keys), keys, "left_anti")
    applied = ch.filter(F.col(op_col) != "D").select(*data_cols)
    return kept.unionByName(applied)


def skyline_2d_min(df: DataFrame, x_col: str, y_col: str,
                   group_cols: tuple = (), extra_aggs: dict = None) -> DataFrame:
    """Pareto frontier (skyline) minimizing (x, y), optionally per
    group: keep rows where no other row has x' <= x AND y' <= y with at
    least one strict.  Input may contain duplicate x values; they are
    first collapsed to the per-x minimum y (anything above it is
    strictly dominated), which also bounds the window input at
    |distinct x| rows per group.

    The naive skyline is an all-pairs NOT EXISTS; for 2 dimensions it is
    a linear scan — after collapsing, a point is on the frontier iff its
    y is strictly below every y at smaller x, i.e. y < min(y) over the
    strictly-preceding window.  One groupBy + one running-min window per
    group partition; no group's window task ever sees more rows than
    there are distinct x values.

    ``extra_aggs`` ({name: aggregate Column}) rides along on the
    collapsing groupBy (e.g. a row count per x) so callers don't need a
    second scan to annotate frontier points.
    """
    from pyspark.sql import Window

    gc = list(group_cols)
    extras = extra_aggs or {}
    pts = (df.groupBy(*gc, F.col(x_col).alias("_x"))
           .agg(F.min(y_col).alias("_y"),
                *[c.alias(n) for n, c in extras.items()]))
    w = (Window.partitionBy(*gc).orderBy("_x")
         .rowsBetween(Window.unboundedPreceding, -1))
    sky = pts.withColumn("_prev_min", F.min("_y").over(w))
    return (sky.where(F.col("_prev_min").isNull()
                      | (F.col("_y") < F.col("_prev_min")))
            .select(*gc, F.col("_x").alias(x_col), F.col("_y").alias(y_col),
                    *extras.keys()))
