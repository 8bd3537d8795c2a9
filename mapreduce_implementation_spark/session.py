"""SparkSession construction.

One builder for the whole engine.  Local defaults target the dev container
(local[N] single-JVM); the same config block is what we would ship to a
1000-executor cluster — AQE on (runtime coalesce + skew-join split), shuffle
partitions sized explicitly, Arrow enabled for the Pandas-UDF slow path,
session timezone pinned to UTC so timestamp semantics match the DuckDB
oracle and are cluster-invariant.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(app_name: str = "mapreduce_implementation_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the engine session.

    ``shuffle_partitions`` defaults to the core count: on local[N] a
    partition per thread; on a real cluster this would be set to
    2-3x total executor cores (and AQE coalesces down at runtime, so
    over-provisioning is safe while under-provisioning is not).
    """
    cpus = _cpus()
    parts = shuffle_partitions or cpus
    builder = (
        # local[N, 4]: up to 4 attempts per task.  Local mode defaults to
        # maxFailures=1, so one stochastic task failure (this container
        # shows rare spurious ones — BENCH_r01 tail) aborts the whole job;
        # a real cluster would retry.  All our jobs are idempotent
        # (deterministic plans, noop/overwrite sinks), so retries are safe.
        SparkSession.builder.master(f"local[{cpus}, 4]")
        .appName(app_name)
        # -- planner / runtime adaptivity (the 100 TB posture) --
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(parts))
        # scans: 128 MiB splits is the scale default; harmless locally
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # joins: broadcast only under threshold; AQE may upgrade at runtime
        .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
        # -- python/arrow path --
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # -- determinism for the oracle --
        .config("spark.sql.session.timeZone", "UTC")
        # -- local-mode memory (driver == only JVM here) --
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # bucketed tables (in-memory catalog) land outside any repo checkout
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
