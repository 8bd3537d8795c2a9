"""Reference-surface queries: tokenize, word count, distributed sort.

These are the two jobs the reference binary ships (SURVEY.md §2 Jobs A/B)
re-expressed over the ``documents`` / ``events`` fixture tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sort import distributed_sort
from ..operators.text import tokenize, word_count
from ..registry import register
from ..sources.tables import load_table

# DuckDB twin of functions.textfn.normalize_token ('g' = replace-all,
# which Spark's regexp_replace does by default).
_NORM = "lower(regexp_replace({tok}, '[^A-Za-z]', '', 'g'))"


@register(
    "tokenize",
    oracle=f"""
    SELECT doc_id, w AS word
    FROM (
        SELECT doc_id, {_NORM.format(tok='tok')} AS w
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
    )
    WHERE w <> ''
    """,
    doc="Reference-exact tokenizer (O3, mapreduce.c:115-132) over documents.text.",
)
def q_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return tokenize(docs, col="text", keep=["doc_id"])


@register(
    "word_count",
    oracle=f"""
    SELECT w AS word, count(*) AS cnt
    FROM (
        SELECT {_NORM.format(tok='tok')} AS w
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    )
    WHERE w <> ''
    GROUP BY w
    ORDER BY cnt DESC, word DESC
    """,
    doc="Job A: word count + (count desc, word desc) order (O3+O5+O8+O10).",
)
def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return word_count(docs, col="text")


@register(
    "distributed_sort",
    oracle="""
    SELECT event_id, value
    FROM events
    ORDER BY value, event_id
    """,
    doc="Job B: global range-partitioned sort, duplicates preserved (O6+O9+O11).",
)
def q_distributed_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("event_id", "value")
    # two-key sort mirrors the reference's stable global order; expressed as
    # range partition + partition-local sort (one shuffle, no single point)
    return (
        events.repartitionByRange(F.col("value"), F.col("event_id"))
        .sortWithinPartitions("value", "event_id")
    )


@register(
    "distributed_sort_desc",
    oracle="""
    SELECT l_orderkey, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey
    """,
    doc="Descending variant of Job B on a fact table column.",
)
def q_distributed_sort_desc(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    return li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"))


@register(
    "partitioned_scan_events_week",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08' AND DATE '2024-01-14'
    GROUP BY event_type
    """,
    doc="Date-partitioned-table scan (the 100 TB fact layout): events "
        "materialized once as event_date=YYYY-MM-DD/ directories, then a "
        "one-week date predicate prunes partitions at PLAN time "
        "(PartitionFilters — pinned in tests/test_plans.py) instead of "
        "scanning the table and filtering rows.",
)
def q_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import partitioned_events_path

    path = partitioned_events_path(spark, sf_dir)
    e = spark.read.parquet(path)
    return (
        e.filter(F.col("event_date").between("2024-01-08", "2024-01-14"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def _export_cache_path(root: str, sf_dir: str, table: str) -> str:
    """Cache dir for a one-time format export, keyed on the SOURCE
    parquet's (mtime, size) so regenerated fixtures can never serve a
    stale export (a bare basename key survives fixture regeneration and
    silently diverges from the oracle's parquet read)."""
    import os

    src = os.path.join(sf_dir, f"{table}.parquet")
    try:
        st = os.stat(src)
        key = f"{int(st.st_mtime)}_{st.st_size}"
    except OSError:
        key = "nosrc"
    return os.path.join(
        root, f"{os.path.basename(sf_dir.rstrip('/'))}_{table}_{key}")


@register(
    "source_jsonl_events",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
    doc="JSON-lines source path: events exported once to JSONL (the "
        "interchange format crawl/annotation pipelines actually deliver), "
        "read back with spark.read.json under an EXPLICIT schema — "
        "schema-on-read without inference (inference is a full extra "
        "scan at 100 TB), column pruning still applies — and aggregated. "
        "Oracle runs the same aggregation on the parquet table, so the "
        "JSONL round-trip itself is what's under test.",
)
def q_source_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    path = _export_cache_path("/tmp/mapreduce_spark_jsonl_cache",
                              sf_dir, "events")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        e.write.mode("overwrite").json(path)
    j = spark.read.schema("event_type string, value double").json(path)
    return (
        j.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"))
    )


@register(
    "source_csv_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="CSV source path: orders exported once to headered CSV, read back "
        "under an EXPLICIT schema (no inference scan) and aggregated; the "
        "oracle runs on the parquet table, so the lossless text round-trip "
        "of doubles/dates is what's under test.  CSV is a row format — no "
        "pushdown, no pruning — which is exactly why the engine treats it "
        "as an ingest format to convert, never a query-time format.",
)
def q_source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice")
    path = _export_cache_path("/tmp/mapreduce_spark_csv_cache",
                              sf_dir, "orders")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        o.write.mode("overwrite").option("header", "true").csv(path)
    c = spark.read.schema("o_orderstatus string, o_totalprice double") \
        .option("header", "true").csv(path)
    return (
        c.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@register(
    "source_orc_roundtrip",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(avg(c_acctbal), 2) AS avg_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
    doc="ORC source path (the second columnar format large warehouses "
        "standardize on): customer exported once to ORC, read back and "
        "aggregated — column pruning and predicate pushdown work on ORC "
        "exactly as on parquet (Spark's OrcScan reports PushedFilters).  "
        "Oracle runs on the parquet table: the round-trip is the test.",
)
def q_source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    c = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_acctbal")
    path = _export_cache_path("/tmp/mapreduce_spark_orc_cache",
                              sf_dir, "customer")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        c.write.mode("overwrite").orc(path)
    r = spark.read.orc(path)
    return (
        r.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("c_acctbal"), 2).alias("avg_bal"))
    )


@register(
    "source_schema_evolution",
    oracle="""
    WITH old AS (
      SELECT event_id, user_id, event_type, NULL AS value
      FROM events WHERE event_id % 2 = 0
    ),
    new AS (
      SELECT event_id, user_id, event_type, value
      FROM events WHERE event_id % 2 = 1
    ),
    merged AS (SELECT * FROM old UNION ALL SELECT * FROM new)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(value) AS BIGINT) AS n_with_value,
           round(coalesce(sum(value), 0), 2) AS total_value
    FROM merged GROUP BY event_type
    """,
    doc="Parquet schema evolution (mergeSchema): an 'old' partition "
        "written WITHOUT the value column and a 'new' partition written "
        "with it, read back as ONE table — Spark unions the file "
        "footers' schemas and null-fills the missing column, the "
        "lakehouse upgrade path that avoids rewriting petabytes of "
        "history when a field is added.  The query proves both the "
        "union (row counts per type) and the null-fill (value count = "
        "new-partition rows only).  Oracle simulates the same split on "
        "the source parquet; the export is cached keyed on the source "
        "file's (mtime, size) like the other round-trip queries.",
)
def q_source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    e = load_table(spark, sf_dir, "events")
    root = _export_cache_path("/tmp/mapreduce_spark_schemaevo_cache",
                              sf_dir, "events")
    old_p, new_p = os.path.join(root, "old"), os.path.join(root, "new")
    if not (os.path.exists(os.path.join(old_p, "_SUCCESS"))
            and os.path.exists(os.path.join(new_p, "_SUCCESS"))):
        (e.where(F.col("event_id") % 2 == 0)
         .select("event_id", "user_id", "event_type")
         .write.mode("overwrite").parquet(old_p))
        (e.where(F.col("event_id") % 2 == 1)
         .select("event_id", "user_id", "event_type", "value")
         .write.mode("overwrite").parquet(new_p))
    merged = (spark.read.option("mergeSchema", "true")
              .parquet(old_p, new_p))
    return (merged.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.count("value").alias("n_with_value"),
                 F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2)
                  .alias("total_value")))
