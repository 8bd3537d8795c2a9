"""Scalar/aggregate/array function surface beyond the core queries:
percentiles, conditional aggregation, null handling, date arithmetic,
array/struct ops, grouping sets, full-outer/cross joins, subqueries —
the long tail a user of a general-purpose engine reaches for.  The
``sql_*`` entries run through spark.sql on registered views to exercise
the SQL entry point (same Catalyst plans as the DataFrame API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import load_table
from ..sql import sql as run_sql


@register(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact continuous percentiles (Spark percentile == DuckDB "
        "quantile_cont); at 100 TB swap to approx_percentile — "
        "see agg_approx_stats.",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
    )


@register(
    "agg_approx_stats",
    oracle="""
    SELECT count(DISTINCT l_partkey)                     AS n_parts_exact,
           count(DISTINCT l_orderkey)                    AS n_orders_exact,
           round(quantile_cont(l_extendedprice, 0.5), 2) AS median_exact,
           TRUE AS parts_within_tol,
           TRUE AS orders_within_tol,
           TRUE AS median_within_tol
    FROM lineitem
    """,
    doc="Sketch aggregates for the 100 TB path: approx_count_distinct "
        "(HyperLogLog++) and approx_percentile (KLL-style) — single "
        "pass, bounded memory, mergeable across partitions.  The sketch "
        "estimates are engine-specific, so the hashable surface is the "
        "exact values plus in-query accuracy bounds (rel err <= 5% for "
        "HLL at rsd=0.02 — a 2.5-sigma margin, the agg_hll_distinct "
        "convention; the DEFAULT rsd=0.05 made the 5% bound a 1-sigma "
        "coin flip and deterministically failed at sf0.001 — and <= 1% "
        "for the percentile sketch) emitted as booleans the oracle "
        "asserts TRUE — both sketches are RNG-free, so the bounds are "
        "deterministic regression pins (checked at all three fixture "
        "SFs).",
)
def q_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def _ok(approx, exact, tol):
        return F.abs(approx - exact) / F.greatest(F.abs(exact), F.lit(1.0)) <= tol

    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts_exact"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 2).alias("median_exact"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_ap"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_ao"),
        F.expr("approx_percentile(l_extendedprice, 0.5)").alias("_am"),
    ).select(
        "n_parts_exact", "n_orders_exact", "median_exact",
        _ok(F.col("_ap"), F.col("n_parts_exact"), 0.05).alias("parts_within_tol"),
        _ok(F.col("_ao"), F.col("n_orders_exact"), 0.05).alias("orders_within_tol"),
        _ok(F.col("_am"), F.col("median_exact"), 0.01).alias("median_within_tol"),
    )


@register(
    "agg_conditional_filter",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (o_totalprice > 250000)              AS n_big,
           count(*) FILTER (o_totalprice <= 250000)             AS n_small,
           round(coalesce(sum(o_totalprice) FILTER (o_orderpriority = '1-URGENT'), 0), 2)
                                                                AS urgent_total
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Conditional aggregation (FILTER clauses == when().otherwise(null) "
        "inside aggregates).",
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    big = F.when(F.col("o_totalprice") > 250000, 1)
    small = F.when(F.col("o_totalprice") <= 250000, 1)
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", F.col("o_totalprice"))
    return o.groupBy("o_orderstatus").agg(
        F.count(big).alias("n_big"),
        F.count(small).alias("n_small"),
        F.round(F.coalesce(F.sum(urgent), F.lit(0.0)), 2).alias("urgent_total"),
    )


@register(
    "null_handling",
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.n_orders, 0) AS n_orders,
           CASE WHEN o.n_orders IS NULL THEN 'inactive' ELSE 'active' END AS status,
           nullif(coalesce(o.n_orders, 0), 0) AS n_or_null
    FROM customer c
    LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders
               WHERE o_totalprice > 480000 GROUP BY o_custkey) o
      ON c.c_custkey = o.o_custkey
    """,
    doc="NULL-handling surface: coalesce / nullif / CASE over outer-join "
        "nulls.",
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_totalprice") > 480000)
         .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders")))
    j = c.join(o, c.c_custkey == o.o_custkey, "left")
    return j.select(
        "c_custkey",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.when(F.col("n_orders").isNull(), "inactive").otherwise("active").alias("status"),
        F.nullif(F.coalesce("n_orders", F.lit(0)), F.lit(0)).alias("n_or_null"),
    )


@register(
    "date_arithmetic",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')   AS due_date,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start,
           CAST(date_part('dow', o_orderdate) AS INTEGER)        AS day_of_week,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
    FROM orders
    WHERE o_orderdate < TIMESTAMP '1995-03-01'
    """,
    doc="Date arithmetic: interval add, day diffs, date_part, date_trunc.",
)
def q_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") < F.lit("1995-03-01").cast("timestamp"))
        .select(
            "o_orderkey",
            F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                          "yyyy-MM-dd").alias("due_date"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
             .cast("long").alias("days_since_epoch_start"),
            (F.dayofweek("o_orderdate") - 1).alias("day_of_week"),
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
             .alias("month_start"),
        )
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding)                                       AS dim,
           round(CAST(list_max(embedding) AS DOUBLE), 6)        AS max_val,
           round(CAST(list_min(embedding) AS DOUBLE), 6)        AS min_val,
           round(list_sum(CAST(embedding AS DOUBLE[])), 6)      AS sum_val,
           round(CAST(embedding[1] AS DOUBLE), 6)               AS first_val,
           len(list_filter(embedding, x -> x > 0))              AS n_positive
    FROM embeddings
    WHERE vec_id < 100
    """,
    doc="Array function surface over the embedding column: size/min/max/"
        "sum/index/filter — all JVM-side.",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    summed = F.aggregate(F.col("embedding"), F.lit(0.0),
                         lambda acc, x: acc + x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("min_val"),
        F.round(summed, 6).alias("sum_val"),
        F.round(F.col("embedding")[0].cast("double"), 6).alias("first_val"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "grouping_sets_sql",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
    doc="Explicit GROUPING SETS through the SQL entry point "
        "(mapreduce_implementation_spark.sql).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


@register(
    "join_full_outer",
    oracle="""
    SELECT coalesce(c.c_nationkey, s.s_nationkey) AS nationkey,
           count(DISTINCT c.c_custkey)  AS n_customers,
           count(DISTINCT s.s_suppkey)  AS n_suppliers
    FROM customer c
    FULL OUTER JOIN supplier s ON c.c_nationkey = s.s_nationkey
    GROUP BY 1
    """,
    doc="Full outer join preserving keys present on either side only.",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    j = c.join(s, c.c_nationkey == s.s_nationkey, "full_outer")
    return j.groupBy(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey")
    ).agg(
        F.countDistinct("c_custkey").alias("n_customers"),
        F.countDistinct("s_suppkey").alias("n_suppliers"),
    )


@register(
    "sql_correlated_subquery",
    oracle="""
    SELECT o_orderkey, round(o_totalprice, 2) AS total_price
    FROM orders o
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.9 FROM orders
                          WHERE o_custkey = o.o_custkey)
    """,
    doc="Correlated scalar subquery (decorrelated by Catalyst into an "
        "aggregate + join) via the SQL entry point.",
)
def q_sql_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, """
        SELECT o_orderkey, round(o_totalprice, 2) AS total_price
        FROM orders o
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.9 FROM orders
                              WHERE o_custkey = o.o_custkey)
    """)


@register(
    "union_all_counts",
    oracle="""
    SELECT kind, count(*) AS n FROM (
        SELECT 'customer' AS kind FROM customer
        UNION ALL
        SELECT 'supplier' AS kind FROM supplier
        UNION ALL
        SELECT 'order' AS kind FROM orders
    ) GROUP BY kind
    """,
    doc="UNION ALL (duplicate-preserving) across heterogeneous inputs.",
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.lit("customer").alias("kind"))
    s = load_table(spark, sf_dir, "supplier").select(F.lit("supplier").alias("kind"))
    o = load_table(spark, sf_dir, "orders").select(F.lit("order").alias("kind"))
    return c.unionByName(s).unionByName(o).groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"))


@register(
    "window_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
                                                      AS last_price,
           round(percent_rank() OVER w, 6)            AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="first_value/last_value (explicit full frame for last) and "
        "percent_rank.",
)
def q_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "pii_mask_digits",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]', 'X', 'g') AS masked_name,
           CAST(length(c_name) -
                length(regexp_replace(c_name, '[0-9]', '', 'g'))
                AS INTEGER) AS n_masked
    FROM customer
    """,
    doc="PII-style scrubbing surface: mask every digit in a free-text "
        "identifier column and report how many characters were redacted. "
        "Pure JVM-side regexp expressions inside whole-stage codegen — "
        "the per-row scrub pattern (emails/phones/SSNs at prod) with "
        "zero shuffle; the digit class stands in for the PII classes "
        "this synthetic data lacks.",
)
def q_pii_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.regexp_replace(name, "[0-9]", "X").alias("masked_name"),
        (F.length(name) - F.length(F.regexp_replace(name, "[0-9]", "")))
        .cast("int").alias("n_masked"),
    )


@register(
    "nested_struct_array_agg",
    oracle="""
    SELECT l_orderkey,
           CAST(count(*) AS BIGINT)              AS n_lines,
           round((min(struct_pack(ln := l_linenumber, q := l_quantity))).q, 2) AS first_qty,
           round((max(struct_pack(ln := l_linenumber, q := l_quantity))).q, 2) AS last_qty,
           round(sum(l_quantity), 2)             AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    """,
    doc="Nested-type surface: collect_list of (linenumber, quantity) "
        "structs per order, array_sort (lexicographic over struct fields "
        "— deterministic regardless of collect order), then element_at "
        "head/tail field access.  The oracle computes the same values "
        "via lexicographic struct min/max (same tiebreak as array_sort "
        "when duplicate line numbers exist); the Spark side goes through "
        "ARRAY<STRUCT> construction, sorting and field extraction to pin "
        "the complex-type pipeline (the shape used for per-doc chunk "
        "lists, per-image region lists, etc.).  One shuffle; the struct "
        "array never exceeds the group's line count.",
)
def q_nested_struct_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    lines = F.array_sort(F.collect_list(F.struct("l_linenumber", "l_quantity")))
    return (
        li.groupBy("l_orderkey")
        .agg(lines.alias("_lines"), F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "l_orderkey",
            F.size("_lines").cast("long").alias("n_lines"),
            F.round(F.element_at("_lines", 1)["l_quantity"], 2).alias("first_qty"),
            F.round(F.element_at("_lines", -1)["l_quantity"], 2).alias("last_qty"),
            "total_qty",
        )
    )


@register(
    "unpivot_lineitem_measures",
    oracle="""
    WITH m AS (
      SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure, count(*) AS n, round(avg(value), 2) AS avg_value,
           round(sum(value), 2) AS sum_value
    FROM m GROUP BY measure
    """,
    doc="UNPIVOT/melt surface: the four lineitem measures rotated into "
        "(measure, value) rows with DataFrame.unpivot — Catalyst's Expand "
        "node, ONE scan emitting 4 rows per input row (the oracle's "
        "UNION ALL form would scan four times) — then a tiny 4-group "
        "aggregate.  Wide-to-long reshaping is how per-metric pipelines "
        "consume fact tables without four separate jobs.",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure", valueColumnName="value")
    return (
        long.groupBy("measure")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("value"), 2).alias("avg_value"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "lateral_explode_outer",
    oracle="""
    SELECT o.o_orderkey, CAST(u.pos - 1 AS INTEGER) AS pos, u.tok
    FROM orders o LEFT JOIN LATERAL (
      SELECT unnest(l) AS tok, generate_subscripts(l, 1) AS pos
      FROM (SELECT list_filter(string_split(o.o_orderpriority, '-'),
                               t -> regexp_matches(t, '^[A-Z]{6,}$')) AS l)
    ) u ON true
    """,
    doc="Outer lateral explode (posexplode_outer): per-order token arrays "
        "where some rows legitimately produce an EMPTY array (priorities "
        "like 2-HIGH have no >=6-letter token) — outer semantics keep "
        "those orders as a (NULL, NULL) row instead of dropping them, the "
        "LEFT JOIN LATERAL of SQL.  Generate-side, zero shuffle; the "
        "inner-explode twin is the tokenizer path.",
)
def q_lateral_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    arr = F.filter(F.split("o_orderpriority", "-"),
                   lambda t: t.rlike("^[A-Z]{6,}$"))
    return o.select("o_orderkey",
                    F.posexplode_outer(arr).alias("pos", "tok"))


@register(
    "sql_recursive_cte_chain",
    oracle="""
    WITH RECURSIVE walk(custkey, cur, depth) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      WHERE c_custkey BETWEEN 1 AND 200
      UNION ALL
      SELECT custkey, cur // 2, depth + 1 FROM walk WHERE cur > 1
    )
    SELECT custkey,
           CAST(max(depth) AS INTEGER) AS depth_to_root,
           CAST(sum(cur) AS BIGINT)    AS path_key_sum
    FROM walk GROUP BY custkey
    """,
    doc="WITH RECURSIVE through the SQL entry point (Spark 4 recursive "
        "CTE): every customer key in [1, 200] walks its halving chain "
        "k -> k/2 -> ... -> 1 (a deterministic parent hierarchy derived "
        "from the data), reporting chain depth and path-key sum — the "
        "org-chart / BOM-explosion query shape.  Spark executes the "
        "recursion as iterative union steps (one per level, log2(k) "
        "levels here), each a plain hash-partitioned map — the same "
        "bounded-iteration discipline as the PageRank/LPA operators, "
        "now available in pure SQL; DuckDB runs the identical recursion "
        "for the oracle.",
)
def q_sql_recursive_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_sql(spark, sf_dir, """
        WITH RECURSIVE walk(custkey, cur, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM customer
          WHERE c_custkey BETWEEN 1 AND 200
          UNION ALL
          SELECT custkey, cur DIV 2, depth + 1 FROM walk WHERE cur > 1
        )
        SELECT custkey,
               CAST(max(depth) AS INT)  AS depth_to_root,
               CAST(sum(cur) AS BIGINT) AS path_key_sum
        FROM walk GROUP BY custkey
    """)


@register(
    "variant_json_surface",
    oracle="""
    SELECT event_id,
           event_type                              AS etype,
           user_id                                 AS uid,
           round(value, 2)                         AS val,
           CAST(props->>'k' AS INTEGER)            AS prop_k,
           CAST(NULL AS INTEGER)                   AS missing_field
    FROM events
    """,
    doc="VARIANT semi-structured surface (Spark 4 open-variant type): "
        "a nested JSON document is built from typed columns "
        "(to_json(struct(...))), parsed once with parse_json into a "
        "VARIANT, and fields are re-extracted with typed variant_get "
        "paths ($.u.user_id, $.u.value) plus the raw props payload "
        "($.k) and a try_variant_get miss that must yield NULL, never "
        "an error.  VARIANT keeps the shredded binary form, so repeated "
        "path extraction skips re-tokenizing the JSON text — the 100 TB "
        "answer to schema-on-read event payloads.  The oracle "
        "reconstructs every value relationally, so a variant "
        "encode/decode bug breaks the hash.",
)
def q_variant_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    doc = F.to_json(F.struct(
        F.col("event_id"),
        F.col("event_type"),
        F.struct(F.col("user_id"), F.col("value")).alias("u"),
    ))
    with_v = (e.withColumn("_v", F.parse_json(doc))
              .withColumn("_pk", F.try_parse_json(F.col("props"))))
    return with_v.select(
        "event_id",
        F.expr("variant_get(_v, '$.event_type', 'string')").alias("etype"),
        F.expr("variant_get(_v, '$.u.user_id', 'bigint')").alias("uid"),
        F.round(F.expr("variant_get(_v, '$.u.value', 'double')"), 2).alias("val"),
        F.expr("variant_get(_pk, '$.k', 'int')").alias("prop_k"),
        F.expr("try_variant_get(_v, '$.nope', 'int')").alias("missing_field"),
    )


@register(
    "source_python_datasource",
    oracle="""
    SELECT CAST(i % 16 AS INTEGER)                  AS bucket,
           count(*)                                 AS n,
           CAST(sum((i * 2654435761) % 1000) AS BIGINT) AS sum_val,
           CAST(min(i) AS BIGINT)                   AS min_id,
           CAST(max(i) AS BIGINT)                   AS max_id
    FROM range(0, 20000) t(i)
    GROUP BY 1
    """,
    doc="Custom connector through the Python Data Source API (Spark 4): "
        "the 'synthrange' source declares its schema, plans 8 "
        "InputPartitions over the id range (one Spark task each — the "
        "same split contract a 100 TB file/shard source exposes), and "
        "generates rows executor-side with zero driver materialization. "
        "Values are an exact integer function of the id, so the DuckDB "
        "oracle recomputes the whole table arithmetically — a "
        "partition-planning or generator bug breaks the hash.",
)
def q_source_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.python_datasource import register_synthrange

    register_synthrange(spark)
    df = (spark.read.format("synthrange")
          .option("n", 20000).option("partitions", 8).load())
    return df.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("sum_val"),
        F.min("id").alias("min_id"),
        F.max("id").alias("max_id"),
    )


@register(
    "sql_lateral_topn",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price,
           CAST(t.rn AS BIGINT) AS rn
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice,
             row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders WHERE o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
    ) t
    """,
    doc="Correlated LATERAL subquery with LIMIT (top-2 orders per "
        "customer) — the SQL-standard per-row-subquery surface Spark 4 "
        "supports natively: Catalyst DECORRELATES the lateral into a "
        "window/top-k over a single join instead of executing one "
        "subquery per customer row, so the declarative 'for each "
        "customer, its 2 priciest orders' costs one shuffle — exactly "
        "the rewrite a user would otherwise hand-roll with "
        "row_number().  Ties broken by o_orderkey for an "
        "engine-portable order.  The identical SQL string runs on both "
        "engines (spark.sql here, DuckDB LATERAL in the oracle).",
)
def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
      SELECT c.c_custkey, t.o_orderkey, round(t.o_totalprice, 2) AS price,
             CAST(t.rn AS BIGINT) AS rn
      FROM customer c,
      LATERAL (
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
      ) t
    """)


@register(
    "scalar_try_functions",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_custkey % 3 = 0 THEN NULL
                ELSE CAST(floor(o_totalprice / (o_custkey % 3)) AS BIGINT)
           END AS safe_div,
           TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast,
           TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS good_cast,
           CAST(o_custkey * 1000000 AS BIGINT) AS big_mul
    FROM orders WHERE o_orderkey <= 1000
    """,
    doc="Error-safe scalar surface (ANSI mode's escape hatches): "
        "try_divide yields NULL on division by zero (o_custkey % 3 "
        "poisons every third row; floored to dodge half-cent rounding "
        "ties, which the two engines break differently), try_cast "
        "yields NULL for "
        "unparseable strings instead of aborting the job ('1-URGENT' "
        "fails whole, its first char parses), and try_multiply passes "
        "values through when no overflow occurs.  One malformed row "
        "killing a 100 TB job is the alternative these exist to "
        "prevent; the oracle expresses the identical NULL semantics "
        "with guarded CASE / TRY_CAST.",
)
def q_scalar_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.floor(F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 3))
         .cast("long").alias("safe_div"),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("int")
         .alias("good_cast"),
        F.try_multiply(F.col("o_custkey"), F.lit(1000000))
         .cast("long").alias("big_mul"))


@register(
    "scalar_url_functions",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/' || doc_id
               || '?lang=' || lang || '&v=2' AS url
      FROM documents WHERE doc_id <= 200
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
    doc="URL parsing surface (parse_url: HOST / PATH / QUERY param / "
        "PROTOCOL) — the per-document provenance normalization every "
        "web-crawl curation pipeline starts with (group by host, strip "
        "tracking params, protocol stats).  URLs are synthesized "
        "deterministically from the documents columns; Spark's "
        "parse_url (a Hive-compat builtin DuckDB lacks) is oracled by "
        "regexes expressing the identical grammar on well-formed URLs, "
        "so a parse_url component-name or separator bug flips the "
        "hash.  Pure codegen expressions — at 100 TB this is a free "
        "rider on the scan.",
)
def q_scalar_url_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") <= 200)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/docs/"), F.col("doc_id").cast("string"),
                   F.lit("?lang="), F.col("lang"), F.lit("&v=2"))
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"))
