"""Subquery-decorrelation query shapes (SURVEY.md §2b Q6/SQL surface).

The reference engine has no subquery machinery at all (its query surface
is mapreduce.c's two fixed jobs); these queries pin the four canonical
decorrelation patterns an analytics engine must plan well at scale —
EXISTS→semi-join, NOT EXISTS→anti-join, IN-with-HAVING→join against an
aggregate, and scalar-subquery→broadcast 1-row cross join — using the
classic TPC-H shapes (Q4/Q13/Q18/Q22) adapted to the fixture schema.

Scale notes: every decorrelation here turns a per-row subquery into ONE
join whose build side is either key-partitioned (semi/anti on the fact
key) or a broadcast scalar; nothing is re-executed per outer row, which
is the difference between O(n) and O(n·m) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table


@register(
    "subq_exists_late_ship",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: EXISTS with a correlated inequality decorrelated "
        "to a LEFT SEMI join on the order key (condition pushed into the "
        "join predicate), so lineitem is scanned once and never "
        "re-executed per order; the date filter pushes to the orders scan.",
)
def q_subq_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
            "left_semi",
        )
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "subq_custdist",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer
      LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape (customer order-count distribution): left outer "
        "join with a filter INSIDE the join condition (so zero-match "
        "customers survive), then two aggregations — the second one is "
        "tiny (distinct counts), so the only real shuffle is on custkey.",
)
def q_subq_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "subq_in_large_orders",
    oracle="""
    SELECT c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_date,
           round(o_totalprice, 2) AS totalprice,
           round(sum_qty, 2) AS sum_qty
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (
      SELECT l_orderkey, sum(l_quantity) AS sum_qty
      FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300
    ) big ON o_orderkey = big.l_orderkey
    """,
    doc="TPC-H Q18 shape (large-volume orders): IN (SELECT ... HAVING) "
        "decorrelated to a join against the aggregate — the HAVING filter "
        "shrinks the build side to ~0.1% of orders BEFORE the join, so "
        "the expensive side is one partial-aggregable shuffle on "
        "l_orderkey and the subsequent joins are tiny.",
)
def q_subq_in_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .where(F.col("sum_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("order_date"),
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round("sum_qty", 2).alias("sum_qty"),
        )
    )


@register(
    "subq_scalar_anti_q22",
    oracle="""
    SELECT c_nationkey, count(*) AS n_custs,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      )
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: scalar subquery (global avg positive balance) "
        "as a broadcast 1-row cross join — computed once, never per row — "
        "plus NOT EXISTS decorrelated to a LEFT ANTI join against the "
        "pre-filtered urgent-orders side.  Both decorrelations keep the "
        "customer scan single-pass.",
)
def q_subq_scalar_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    urgent = o.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
