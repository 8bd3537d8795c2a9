"""Pandas-UDF surface (reference O13 generalized): the reference's only
"UDF" mechanism is its compiled-in map/reduce function pairs
(mapreduce.c:511-515); here user logic plugs in as Arrow-vectorized
Pandas UDFs.  This query computes the same values as a pure-SQL twin so
the UDF path itself is oracle-checked end-to-end (serialization, Arrow
batching, null handling)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table


def _make_udfs():
    """Built lazily: pandas_udf type resolution needs an active session,
    and query modules import session-free (registry loads at collection
    time)."""

    @F.pandas_udf("double")
    def discounted_charge(price: pd.Series, discount: pd.Series,
                          tax: pd.Series) -> pd.Series:
        # vectorized over Arrow batches; identical arithmetic to the SQL twin
        return price * (1.0 - discount) * (1.0 + tax)

    @F.pandas_udf("long")
    def bucket10k(price: pd.Series) -> pd.Series:
        return (price // 10_000).astype("int64")

    return discounted_charge, bucket10k


@register(
    "pandas_udf_charge",
    oracle="""
    SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS price_bucket,
           count(*) AS n,
           round(sum(o_totalprice * (1 - 0.05) * (1 + 0.08)), 2) AS charged
    FROM orders
    GROUP BY 1
    """,
    doc="Arrow-vectorized Pandas UDFs in a grouped aggregation, oracle-"
        "checked against the pure-SQL equivalent (the UDF transport layer "
        "itself is under test).",
)
def q_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    discounted_charge, bucket10k = _make_udfs()
    o = load_table(spark, sf_dir, "orders")
    charged = discounted_charge(
        F.col("o_totalprice"), F.lit(0.05), F.lit(0.08))
    return (
        o.select(bucket10k(F.col("o_totalprice")).alias("price_bucket"),
                 charged.alias("_charge"))
        .groupBy("price_bucket")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("_charge"), 2).alias("charged"))
    )
