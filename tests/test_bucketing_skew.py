"""Scale-strategy tests: bucketed co-located joins (zero exchanges) and
salted joins for adversarial skew (row-identical to the plain join)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from mapreduce_implementation_spark.operators.bucketing import bucketed, write_bucketed
from mapreduce_implementation_spark.operators.skew import salted_join
from mapreduce_implementation_spark.plans.inspect import plan_string
from mapreduce_implementation_spark.sources.tables import load_table
from tests.conftest import SF_DIR_001


def test_bucketed_join_has_zero_exchanges(spark):
    li = load_table(spark, SF_DIR_001, "lineitem")
    o = load_table(spark, SF_DIR_001, "orders")
    write_bucketed(li, "li_bucketed", "l_orderkey", 8)
    write_bucketed(o, "o_bucketed", "o_orderkey", 8)
    j = (
        bucketed(spark, "li_bucketed")
        .hint("merge")  # force SortMergeJoin so the no-shuffle claim is real
        .join(bucketed(spark, "o_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
    )
    plan = plan_string(j)
    n_shuffles = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    assert "SortMergeJoin" in plan, plan
    assert n_shuffles == 0, f"bucketed join should not shuffle:\n{plan}"
    assert j.count() == li.count()  # every lineitem has its order


def test_salted_join_matches_plain_join(spark):
    """Row-level equivalence on a deliberately skewed build: 80% of events
    share one hot user joined against per-user dims."""
    e = load_table(spark, SF_DIR_001, "events").select("event_id", "user_id")
    hot = e.withColumn("user_id", F.when(F.col("event_id") % 5 != 0, F.lit(7))
                       .otherwise(F.col("user_id")))
    dims = (load_table(spark, SF_DIR_001, "customer")
            .select(F.col("c_custkey").alias("user_id"), "c_mktsegment"))
    plain = hot.join(dims, "user_id").select("event_id", "c_mktsegment")
    salted = salted_join(hot, dims, "user_id", salt=8).select("event_id", "c_mktsegment")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
