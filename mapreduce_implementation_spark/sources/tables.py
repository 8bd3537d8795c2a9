"""Sources.

The reference's only source is a directory of newline-delimited text files
(``read_filename``, mapreduce.c:39-54; one map task per file).  Spark's text
source subsumes it — splittable, parallel, predicate-prunable — so the text
reader here is a thin wrapper.  The structured fixtures (TESTDATA.md) are
parquet; we read them with explicit paths and rely on Catalyst for column
pruning / filter pushdown (check via plans.inspect).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# every driver-generated fixture table (TESTDATA.md)
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table: ``{sf_dir}/{name}.parquet``.

    ``events.ts`` normalization (the fixture's writer has varied between
    rounds):

    * parquet TIMESTAMP(NANOS) — Spark's vectorized reader rejects it; we
      read it as long (runtime-settable legacy conf) and integer-divide
      to micros — identical truncation to DuckDB's ns->us, and plain int
      arithmetic (double division would lose precision at 1.7e18 ns
      epochs);
    * TIMESTAMP with isAdjustedToUTC=false — Spark infers TIMESTAMP_NTZ,
      which Structured Streaming refuses as an event-time column and
      which forbids numeric casts; cast to TIMESTAMP (session tz is UTC
      in this container, so the cast is value-preserving and matches
      DuckDB's naive reading).

    Works on any caller-provided session, including the driver's.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        df = spark.read.parquet(path)
    except Exception as e:  # AnalysisException: PARQUET_TYPE_ILLEGAL (nanos)
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def spread_small_input(df: DataFrame) -> DataFrame:
    """Round-robin-repartition a SUB-PARALLELISM input up to the
    session's core count — the guide-§2.5 "input skew" fix for
    compute-bound map phases over small files (r14 opt).

    One file under ``maxPartitionBytes`` is ONE scan split, so every
    map stage below the first exchange — shingling + 64-seed hashing,
    200x md5 fan-outs, broadcast-join cosine scoring, vectorized
    matmuls — runs on a single core no matter how many the session
    has.  Scale-adaptive by construction: the guard compares the
    frame's actual partition count against ``defaultParallelism``, so
    a production table (thousands of splits) passes through untouched
    and never pays the exchange, while a sub-parallelism input pays
    one trivially small round-robin shuffle (deterministic under task
    retry via Spark's sort-before-repartition) to unlock every core.

    Applied ONLY at the entry of operators whose per-row map work
    dominates (the measured single-core walls), NOT in
    :func:`load_table`: a blanket spread taxes every cheap scan+agg
    query with an exchange it cannot amortize (measured +0.2-0.4 s on
    sub-second relational queries) and inserts a Repartition node into
    plans whose zero/one-shuffle shape is a pinned scale property.
    Row values are unchanged; every oracle hash is order-insensitive.

    CONTRACT (r14 ADVICE): pass SCAN-LEVEL frames only — a base table
    read plus row-local projections/filters, nothing downstream of a
    shuffle.  The guard reads ``df.rdd.getNumPartitions()``, and under
    AQE accessing ``.rdd`` finalizes the physical plan and EAGERLY
    RUNS any upstream shuffle stages as real jobs that the returned
    DataFrame then re-executes.  Every current call site is scan-level
    (char shingles, word n-grams, substring windows, the bootstrap
    ladder, BPE/tokenize entries), where ``.rdd`` is a metadata-only
    probe of the scan's split count.
    """
    sc = df.sparkSession.sparkContext
    par = sc.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Read all fixture tables; keys match DuckDB oracle view names."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def partitioned_events_path(spark: SparkSession, sf_dir: str,
                            base: str | None = None) -> str:
    """Materialize (once) a date-partitioned copy of ``events`` —
    ``.../event_date=YYYY-MM-DD/*.parquet`` — and return its path.

    This is the 100 TB table layout discipline: facts land partitioned by
    ingestion date so date predicates prune whole directories at plan
    time (PartitionFilters) instead of scanning the full table.  The copy
    is keyed by sf dir and written write-once (idempotent across queries
    in a session and across sessions).
    """
    base = base or os.environ.get("SPARK_GRAFT_DERIVED", "/tmp/spark_graft_derived")
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    out = os.path.join(base, sf_name, "events_by_date")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        events = load_table(spark, sf_dir, "events")
        (events.withColumn("event_date", F.to_date("ts"))
         .write.mode("overwrite").partitionBy("event_date").parquet(out))
    return out


def read_text_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory-of-text-files source (reference O1+O2, mapreduce.c:39-54,94-107).

    One row per line, column ``value: string``.  Unlike the reference's
    file-per-task grain, Spark packs/splits files into
    ``spark.sql.files.maxPartitionBytes`` partitions — finer-grained and
    skew-resistant at 100 TB.
    """
    return spark.read.text(path)


def read_json(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Newline-delimited JSON source. Pass an explicit ``schema``
    (StructType or DDL string) in production — schema inference costs a
    full extra pass over the data, which at 100 TB is a second scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Columnar ORC source — filter pushdown and column pruning apply as
    with parquet (verify via plans.inspect assertions)."""
    return spark.read.orc(path)


def read_int_lines(spark: SparkSession, path: str) -> DataFrame:
    """Integer-per-line source of the reference sort job (mapreduce.c:151-163).

    The reference tokenizes each line on spaces and ``stoi``-parses each
    token; we mirror that (a line may hold several ints) and use LongType
    for headroom over the reference's 32-bit assumption.  Column ``n: long``.
    """
    lines = spark.read.text(path)
    tok = F.explode(F.split(F.col("value"), " ")).alias("tok")
    return (
        lines.select(tok)
        .filter(F.col("tok") != "")
        .select(F.col("tok").cast("long").alias("n"))
        .filter(F.col("n").isNotNull())
    )
