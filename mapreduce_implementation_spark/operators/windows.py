"""Window-function operators (SURVEY.md §2b Q9) — absent from the
reference; added per the extension surface.

Determinism discipline: every ``orderBy`` inside a window spec includes a
unique tiebreaker key, otherwise row_number/lag results are
partition-order-dependent and cannot hash-match any oracle.  At 100 TB a
window spec costs one shuffle on its partition keys; specs sharing keys
reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from .caching import tracked_persist

__all__ = ["ranked", "with_lag", "running_agg", "top_k_per_group",
           "global_ntile", "global_running_sum"]


def _spec(partition_by: list[str], order_by: list[Column]) -> WindowSpec:
    return Window.partitionBy(*partition_by).orderBy(*order_by)


def ranked(df: DataFrame, partition_by: list[str], order_by: list[Column],
           kind: str = "rank", out: str = "rnk") -> DataFrame:
    fn = {"rank": F.rank, "dense_rank": F.dense_rank, "row_number": F.row_number}[kind]
    return df.withColumn(out, fn().over(_spec(partition_by, order_by)))


def with_lag(df: DataFrame, col: str, partition_by: list[str],
             order_by: list[Column], offset: int = 1, out: str | None = None) -> DataFrame:
    out = out or f"{col}_lag{offset}"
    return df.withColumn(out, F.lag(col, offset).over(_spec(partition_by, order_by)))


def running_agg(df: DataFrame, agg: Column, partition_by: list[str],
                order_by: list[Column], out: str,
                preceding: int | None = None) -> DataFrame:
    """Cumulative (preceding=None) or moving-frame aggregate over rows."""
    start = Window.unboundedPreceding if preceding is None else -preceding
    spec = _spec(partition_by, order_by).rowsBetween(start, Window.currentRow)
    return df.withColumn(out, agg.over(spec))


def top_k_per_group(df: DataFrame, partition_by: list[str],
                    order_by: list[Column], k: int) -> DataFrame:
    """Per-group top-k: window row_number + filter — the scalable idiom
    (no per-group sort materialization beyond the one shuffle)."""
    return (
        df.withColumn("_rn", F.row_number().over(_spec(partition_by, order_by)))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def global_ntile(df: DataFrame, order_by: list[Column], n_tiles: int,
                 out: str = "tile", partitions: int | None = None) -> DataFrame:
    """Exact SQL ``ntile(k) OVER (ORDER BY ...)`` WITHOUT the
    single-partition global window (the classic distributed two-phase
    global ranking).

    Phase 1: range-partition on the sort key — partitions hold disjoint,
    ordered key ranges, so global rank = rank within partition + number
    of rows in all earlier partitions.  Phase 2: per-partition
    ``row_number`` (parallel across partitions), plus a tiny
    per-partition count frame (``partitions`` rows) whose cumulative
    offsets broadcast back.  ntile semantics: with N rows the first
    (N mod k) tiles take ceil(N/k) rows, the rest floor(N/k).

    The sort key must be a total order (include a unique tiebreaker) or
    ties straddling a range boundary make ranks nondeterministic.

    ``ranged`` feeds TWO consumers (the local rank and the per-partition
    counts), and correctness requires both to see the SAME partition
    boundaries and ``_pid`` assignment.  Range boundaries come from a
    sampling job and ``spark_partition_id()`` is evaluation-dependent,
    so the frame is persisted before branching: the broadcast-offsets
    job materializes it once and every consumer reads that one
    materialization (both plan subtrees show InMemoryTableScan —
    pinned in tests/test_plans.py::test_global_window_single_range_exchange).
    """
    spark = df.sparkSession
    parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = tracked_persist(
        df.repartitionByRange(parts, *order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = ranked(ranged, ["_pid"], order_by, kind="row_number", out="_local_rn")
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = counts.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_offset"),
        F.sum("_cnt").over(w_all).alias("_n"),
    )
    r = F.col("_local_rn") + F.col("_offset")
    k = F.lit(n_tiles).cast("long")
    q = F.floor(F.col("_n") / k)
    rem = F.col("_n") % k
    cut = rem * (q + 1)
    tile = F.when(r <= cut, F.floor((r - 1) / (q + 1)) + 1).otherwise(
        rem + F.floor((r - cut - 1) / F.greatest(q, F.lit(1))) + 1)
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, tile.cast("int"))
        .drop("_pid", "_local_rn", "_offset", "_n")
    )


def global_running_sum(df: DataFrame, value_col: str,
                       order_by: list[Column], out: str = "cum",
                       partitions: int | None = None) -> DataFrame:
    """Exact ``sum(v) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    WITHOUT a single-partition window — the prefix-sum sibling of
    :func:`global_ntile`, same two-phase shape.

    Phase 1: range-partition on the (total-ordered) sort key; partitions
    hold disjoint key ranges.  Phase 2: per-partition cumulative sum in
    parallel, plus a ``partitions``-row per-partition-total frame whose
    exclusive prefix offsets broadcast back; global cumsum = local
    cumsum + offset of everything in earlier partitions.

    The sort key must include a unique tiebreaker or ties straddling a
    range boundary make the prefix nondeterministic.

    Same single-evaluation discipline as :func:`global_ntile`: ``ranged``
    feeds both the local-cumsum and per-partition-totals subtrees, and
    the ``_pid`` assignment must be identical in both — range-boundary
    sampling and ``spark_partition_id()`` are evaluation-dependent, so
    the frame is persisted before branching (one materialization, both
    consumers read the cache; plan-pinned).
    """
    spark = df.sparkSession
    parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = tracked_persist(
        df.repartitionByRange(parts, *order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = ranged.withColumn(
        "_local_cum",
        F.sum(value_col).over(
            Window.partitionBy("_pid").orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_offset"))
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out, F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_local_cum", "_offset")
    )


def grouped_running_sum(df: DataFrame, value_col: str, group_cols: list[str],
                        order_by: list[Column], out: str = "cum",
                        partitions: int | None = None) -> DataFrame:
    """Exact ``sum(v) OVER (PARTITION BY g ORDER BY ...)`` that stays
    distributed even when single groups dwarf a partition — the grouped
    sibling of :func:`global_running_sum`.

    A plain keyed window puts each ENTIRE group in one task: fine for
    many small groups, fatal when one group holds billions of rows (the
    3-value l_returnflag case).  Instead: range-partition on
    (group..., order...) — groups occupy contiguous partition runs, a
    huge group spans MANY partitions — then per-(partition, group)
    local cumsums run in parallel, and the per-(partition, group)
    totals frame (at most partitions + distinct-groups rows, because a
    partition holds a contiguous group range) computes each group's
    exclusive prefix offsets with a window partitioned BY GROUP over
    partition ids.  Offsets come back via a keyed join (not broadcast:
    group cardinality may itself be huge — Spark upgrades to broadcast
    when stats allow).

    Same single-evaluation discipline as the global operators: the
    ranged frame is persisted so both consumers see one ``_pid``
    assignment.
    """
    spark = df.sparkSession
    parts = partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    gcols = [F.col(g) for g in group_cols]
    ranged = tracked_persist(
        df.repartitionByRange(parts, *gcols, *order_by)
        .withColumn("_pid", F.spark_partition_id())
    )
    local = ranged.withColumn(
        "_local_cum",
        F.sum(value_col).over(
            Window.partitionBy("_pid", *group_cols).orderBy(*order_by)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    totals = ranged.groupBy("_pid", *group_cols).agg(
        F.sum(value_col).alias("_tot"))
    w_off = (Window.partitionBy(*group_cols).orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.select(
        "_pid", *group_cols,
        F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_offset"))
    return (
        local.join(offsets, ["_pid", *group_cols])
        .withColumn(out, F.col("_local_cum") + F.col("_offset"))
        .drop("_pid", "_local_cum", "_offset")
    )
