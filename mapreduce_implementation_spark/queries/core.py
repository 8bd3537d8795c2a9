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
