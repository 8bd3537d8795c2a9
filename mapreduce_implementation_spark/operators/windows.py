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

__all__ = ["ranked", "with_lag", "running_agg", "top_k_per_group"]


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
