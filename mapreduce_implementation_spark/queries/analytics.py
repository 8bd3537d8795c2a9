"""Event-analytics queries: funnel conversion and cohort retention.

Product-analytics staples over the ``events`` fixture — both are pure
aggregation pipelines (no window over the full event stream, no
per-user collect), so they scale as two or three hash shuffles keyed by
``user_id`` / cohort week no matter how large the event log is.

Reference parity: the reference engine (mapreduce.c) has no analytics
surface; this is north-star §2b (events-table) coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

# Sequential funnel: a later step counts only if it happens strictly
# after the user's earliest completion of the previous step.
_FUNNEL_STEPS = ("view", "click", "purchase")


@register(
    "funnel_conversion",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS ts1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS ts2
      FROM events e JOIN t1 ON e.user_id = t1.user_id
      WHERE e.event_type = 'click' AND e.ts > t1.ts1
      GROUP BY e.user_id
    ),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS ts3
      FROM events e JOIN t2 ON e.user_id = t2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > t2.ts2
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM t1) AS step1_view,
           (SELECT count(*) FROM t2) AS step2_click,
           (SELECT count(*) FROM t3) AS step3_purchase,
           round((SELECT count(*) FROM t3) * 1.0
                 / (SELECT count(*) FROM t1), 6) AS conversion
    """,
    doc="Strictly-ordered 3-step funnel (view -> click -> purchase): a "
        "step counts only when it occurs after the user's earliest "
        "completion of the previous step.  Three per-user min-aggregations "
        "chained by join — each stage shuffles on user_id once and AQE "
        "reuses the partitioning; no event-stream-wide window.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    step = None
    counts = []
    for i, etype in enumerate(_FUNNEL_STEPS, start=1):
        stage = ev.where(F.col("event_type") == etype)
        if step is not None:
            stage = stage.join(step, "user_id").where(F.col("ts") > F.col("prev_ts"))
        step = stage.groupBy("user_id").agg(F.min("ts").alias("prev_ts"))
        counts.append(step.agg(F.count(F.lit(1)).alias(f"c{i}")))
    c1, c2, c3 = counts
    return (
        c1.crossJoin(c2).crossJoin(c3)
        .select(
            F.col("c1").alias("step1_view"),
            F.col("c2").alias("step2_click"),
            F.col("c3").alias("step3_purchase"),
            F.round(F.col("c3") / F.col("c1"), 6).alias("conversion"),
        )
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             date_diff('week', f.cohort_week, date_trunc('week', e.ts))
               AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           CAST(week_offset AS BIGINT) AS week_offset,
           count(*) AS active_users
    FROM activity
    GROUP BY 1, 2
    """,
    doc="Weekly cohort retention: users bucketed by first-seen week, "
        "active-user counts per (cohort_week, week_offset).  One shuffle "
        "to find first-seen, one distinct on (user, offset), one count — "
        "output is O(weeks^2) regardless of event volume.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id", "cohort_week",
            (F.datediff(F.date_trunc("week", F.col("ts")),
                        F.col("cohort_week")) / 7).cast("long").alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
        .select(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset", "active_users",
        )
    )
