"""Data-profiling queries: column stats, histograms, deterministic sampling.

The data-quality layer of an LLM-pipeline engine: profile a table before
ingest, histogram a measure, and draw a *reproducible* sample without any
seed state (hash-based, so the same rows are sampled on any cluster size,
any partitioning, any engine — the DuckDB oracle literally reproduces it).

Reference parity: none (mapreduce.c has no profiling); north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table

# (column, kind) pairs profiled on orders; kind picks the min/max rendering.
_PROFILE_COLS = [
    ("o_orderkey", "num"),
    ("o_custkey", "num"),
    ("o_orderstatus", "str"),
    ("o_totalprice", "num"),
    ("o_orderdate", "ts"),
    ("o_orderpriority", "str"),
]


@register(
    "profile_columns",
    oracle="""
    WITH s AS (
      SELECT count(*) AS n,
        count(o_orderkey) AS nn0, count(DISTINCT o_orderkey) AS nd0,
          CAST(min(o_orderkey) AS VARCHAR) AS mn0, CAST(max(o_orderkey) AS VARCHAR) AS mx0,
        count(o_custkey) AS nn1, count(DISTINCT o_custkey) AS nd1,
          CAST(min(o_custkey) AS VARCHAR) AS mn1, CAST(max(o_custkey) AS VARCHAR) AS mx1,
        count(o_orderstatus) AS nn2, count(DISTINCT o_orderstatus) AS nd2,
          min(o_orderstatus) AS mn2, max(o_orderstatus) AS mx2,
        count(o_totalprice) AS nn3, count(DISTINCT o_totalprice) AS nd3,
          CAST(min(o_totalprice) AS VARCHAR) AS mn3, CAST(max(o_totalprice) AS VARCHAR) AS mx3,
        count(o_orderdate) AS nn4, count(DISTINCT o_orderdate) AS nd4,
          strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mn4,
          strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS mx4,
        count(o_orderpriority) AS nn5, count(DISTINCT o_orderpriority) AS nd5,
          min(o_orderpriority) AS mn5, max(o_orderpriority) AS mx5
      FROM orders
    )
    SELECT 'o_orderkey' AS column_name, n - nn0 AS n_nulls, nd0 AS n_distinct, mn0 AS min_val, mx0 AS max_val FROM s
    UNION ALL SELECT 'o_custkey', n - nn1, nd1, mn1, mx1 FROM s
    UNION ALL SELECT 'o_orderstatus', n - nn2, nd2, mn2, mx2 FROM s
    UNION ALL SELECT 'o_totalprice', n - nn3, nd3, mn3, mx3 FROM s
    UNION ALL SELECT 'o_orderdate', n - nn4, nd4, mn4, mx4 FROM s
    UNION ALL SELECT 'o_orderpriority', n - nn5, nd5, mn5, mx5 FROM s
    """,
    doc="Whole-table column profile (nulls / exact distinct / min / max "
        "per column) in ONE pass: a single multi-distinct aggregate "
        "(Catalyst expands it map-side) unpivoted with stack() — never "
        "one scan per column.  min/max rendered to strings so every "
        "column type shares one output schema.",
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, (c, kind) in enumerate(_PROFILE_COLS):
        if kind == "ts":
            mn = F.date_format(F.min(c), "yyyy-MM-dd HH:mm:ss")
            mx = F.date_format(F.max(c), "yyyy-MM-dd HH:mm:ss")
        else:
            mn, mx = F.min(c).cast("string"), F.max(c).cast("string")
        aggs += [F.count(c).alias(f"nn{i}"), F.count_distinct(F.col(c)).alias(f"nd{i}"),
                 mn.alias(f"mn{i}"), mx.alias(f"mx{i}")]
    row = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', n - nn{i}, nd{i}, mn{i}, mx{i}" for i, (c, _) in enumerate(_PROFILE_COLS))
    return row.selectExpr(
        f"stack({len(_PROFILE_COLS)}, {stack_args}) "
        "AS (column_name, n_nulls, n_distinct, min_val, max_val)")


@register(
    "histogram_totalprice",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS lo,
           count(*) AS n,
           CAST(round(min(o_totalprice), 2) AS DOUBLE) AS min_in_bucket,
           CAST(round(max(o_totalprice), 2) AS DOUBLE) AS max_in_bucket
    FROM orders GROUP BY 1
    """,
    doc="Fixed-width histogram of order totals (50k buckets): one "
        "partial-aggregable shuffle keyed on the bucket id; output is "
        "O(range/width) rows regardless of table size.",
)
def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / 50000).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.min("o_totalprice"), 2).alias("min_in_bucket"),
             F.round(F.max("o_totalprice"), 2).alias("max_in_bucket"))
        .select("bucket", (F.col("bucket") * 50000).alias("lo"),
                "n", "min_in_bucket", "max_in_bucket")
    )


@register(
    "sample_hash_pct",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
    doc="Deterministic ~10% sample via content hashing (md5 of the key, "
        "keep hex prefix < '1a' = 26/256): reproducible across engines, "
        "cluster sizes and partitionings — no RNG seed state, unlike "
        "df.sample().  The filter pushes to the scan; no shuffle at all.",
)
def q_sample_hash_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.where(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@register(
    "sample_stratified",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT)       AS n_sampled,
           round(sum(o_totalprice), 2)    AS sum_price
    FROM orders
    WHERE substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) <
          CASE WHEN o_orderpriority = '1-URGENT' THEN '33'
               WHEN o_orderpriority = '2-HIGH'   THEN '1a'
               ELSE '0d' END
    GROUP BY o_orderpriority
    """,
    doc="Stratified deterministic sampling: per-stratum rates (~20% "
        "urgent, ~10% high, ~5% rest) applied via the content-hash trick "
        "— the rate table is a broadcast map joined onto the scan, so "
        "sampling is a pushable filter with NO rng state, reproducible "
        "across engines, partitionings and cluster sizes (df.sampleBy is "
        "none of those).  This is how you build a fixed eval slice out "
        "of 100 TB without materializing an intermediate.",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    rates = o.sparkSession.createDataFrame(
        [("1-URGENT", "33"), ("2-HIGH", "1a"), ("3-MEDIUM", "0d"),
         ("4-NOT SPECIFIED", "0d"), ("5-LOW", "0d")],
        "o_orderpriority string, _thresh string",
    )
    return (
        o.join(F.broadcast(rates), "o_orderpriority")
        .where(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2)
               < F.col("_thresh"))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_sampled"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@register(
    "dq_rule_report",
    oracle="""
    SELECT 'orders_pk_unique' AS rule, 'orders' AS table_name,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations,
           count(*) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders', 'lineitem',
           CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT), count(*)
    FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
    UNION ALL
    SELECT 'customer_acctbal_nonneg', 'customer',
           CAST(count(*) FILTER (WHERE c_acctbal < 0) AS BIGINT), count(*)
    FROM customer
    UNION ALL
    SELECT 'lineitem_discount_le_8pct', 'lineitem',
           CAST(count(*) FILTER (WHERE l_discount > 0.08) AS BIGINT), count(*)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_qty_in_1_50', 'lineitem',
           CAST(count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT),
           count(*)
    FROM lineitem
    UNION ALL
    SELECT 'events_value_nonneg', 'events',
           CAST(count(*) FILTER (WHERE value IS NULL OR value < 0) AS BIGINT),
           count(*)
    FROM events
    """,
    doc="Declarative data-quality rule engine (the pre-ingest gate every "
        "100 TB pipeline runs): PK uniqueness, FK orphan detection, "
        "domain/range rules and null rules evaluated as ONE conditional "
        "aggregation per table — lineitem's three row-level rules share "
        "a single scan — plus one left join for the FK rule (at scale "
        "Spark picks shuffled/broadcast by stats; a bloom pre-filter is "
        "the runtime escalation, see the runtime-bloom plan test).  The "
        "fixture intentionally trips two rules (negative TPC-H account "
        "balances, >8% discounts) so the report proves it detects, not "
        "just passes.",
)
def q_dq_rule_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    c = load_table(spark, sf_dir, "customer")
    e = load_table(spark, sf_dir, "events")

    def report(df, rule, table, viol_col):
        return df.agg(
            F.lit(rule).alias("rule"),
            F.lit(table).alias("table_name"),
            viol_col.alias("n_violations"),
            F.count(F.lit(1)).alias("n_checked"),
        )

    pk = report(o, "orders_pk_unique", "orders",
                F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
    fk = report(
        li.join(o.select("o_orderkey"), li.l_orderkey == o.o_orderkey, "left"),
        "lineitem_fk_orders", "lineitem",
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).cast("long"))
    bal = report(c, "customer_acctbal_nonneg", "customer",
                 F.count(F.when(F.col("c_acctbal") < 0, 1)).cast("long"))
    # lineitem row-level rules share one scan: a single agg node carrying
    # both conditional counts, split into rows afterwards
    li_agg = li.agg(
        F.count(F.when(F.col("l_discount") > 0.08, 1)).alias("_disc"),
        F.count(F.when((F.col("l_quantity") < 1)
                       | (F.col("l_quantity") > 50), 1)).alias("_qty"),
        F.count(F.lit(1)).alias("_n"),
    )
    li_rules = li_agg.select(F.explode(F.array(
        F.struct(F.lit("lineitem_discount_le_8pct").alias("rule"),
                 F.lit("lineitem").alias("table_name"),
                 F.col("_disc").alias("n_violations"),
                 F.col("_n").alias("n_checked")),
        F.struct(F.lit("lineitem_qty_in_1_50").alias("rule"),
                 F.lit("lineitem").alias("table_name"),
                 F.col("_qty").alias("n_violations"),
                 F.col("_n").alias("n_checked")),
    )).alias("r")).select("r.*")
    ev = report(e, "events_value_nonneg", "events",
                F.count(F.when(F.col("value").isNull()
                               | (F.col("value") < 0), 1)).cast("long"))
    return (pk.unionByName(fk).unionByName(bal)
            .unionByName(li_rules).unionByName(ev))


@register(
    "sketch_quantile_histogram",
    oracle="""
    WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
               WHERE l_extendedprice IS NOT NULL),
    mm AS (SELECT min(x) AS lo, max(x) AS hi, count(*) AS n FROM v),
    b AS (SELECT CASE WHEN hi = lo THEN 0 ELSE
            least(CAST(floor((x - lo) / ((hi - lo) / 256.0)) AS BIGINT), 255)
          END AS bin FROM v, mm),
    h AS (SELECT bin, count(*) AS c FROM b GROUP BY bin),
    cum AS (SELECT bin, sum(c) OVER (ORDER BY bin) AS cc FROM h),
    qs AS (SELECT CAST(q AS DOUBLE) AS q
           FROM (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) t(q)),
    est AS (SELECT q, min(bin) AS qbin
            FROM qs, cum, mm WHERE cc >= q * n GROUP BY q),
    ex AS (SELECT quantile_disc(x, 0.25) AS e1, quantile_disc(x, 0.5) AS e2,
                  quantile_disc(x, 0.75) AS e3, quantile_disc(x, 0.9) AS e4,
                  quantile_disc(x, 0.99) AS e5 FROM v),
    exl AS (SELECT 0.25 AS q, e1 AS ev FROM ex UNION ALL
            SELECT 0.5, e2 FROM ex UNION ALL SELECT 0.75, e3 FROM ex
            UNION ALL SELECT 0.9, e4 FROM ex UNION ALL SELECT 0.99, e5 FROM ex)
    SELECT est.q,
           round(lo + (qbin + 1) * ((hi - lo) / 256.0), 6) AS est_value,
           round(ev, 6) AS exact_value,
           (abs(lo + (qbin + 1) * ((hi - lo) / 256.0) - ev)
              <= (hi - lo) / 256.0) AS within_bound
    FROM est JOIN exl USING (q), mm
    """,
    doc="Mergeable equi-width-histogram quantile sketch over "
        "l_extendedprice (the fixed-state member of the t-digest/KLL "
        "family, joining the registered count-min and HLL sketches): "
        "pass 1 = (min, max, n) scalar frame; pass 2 = 256-bin counted "
        "histogram whose partials merge map-side, so the shuffle is "
        "<= 256 rows at any data size.  The estimate (first bin edge "
        "whose cumulative count reaches q*n) is deterministic double "
        "arithmetic, reproduced bit-for-bit by the oracle; the exact "
        "DISCRETE quantile (the rank-ceil(q*n) order statistic, Spark "
        "percentile_disc == DuckDB quantile_disc) rides along, and "
        "`within_bound` pins the provable |est - exact| <= (max-min)/256 "
        "in-query (no bound exists vs the interpolated quantile, which "
        "can straddle empty bins on sparse data).",
)
def q_sketch_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import histogram_quantile_estimates

    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    li = load_table(spark, sf_dir, "lineitem")
    est = histogram_quantile_estimates(li, "l_extendedprice", bins=256, qs=qs)
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    disc = ", ".join(
        f"percentile_disc({q}) WITHIN GROUP "
        "(ORDER BY CAST(l_extendedprice AS DOUBLE))" for q in qs)
    exl = (li.selectExpr(f"array({disc}) AS ev")
           .select(F.posexplode("ev").alias("i", "exact_v"))
           .select(F.element_at(qarr, F.col("i") + 1).alias("q"), "exact_v"))
    return (est.join(exl, "q")
            .select("q", F.round("est_value", 6).alias("est_value"),
                    F.round("exact_v", 6).alias("exact_value"),
                    (F.abs(F.col("est_value") - F.col("exact_v"))
                     <= F.col("err_bound")).alias("within_bound")))
