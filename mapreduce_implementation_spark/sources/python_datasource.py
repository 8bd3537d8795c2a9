"""Custom connector via the Python Data Source API (Spark 4,
SPARK-44076): the engine's demonstration that a NEW source format can be
added in pure Python — schema declaration, option handling, and
partition planning all live in the source, and Spark schedules one task
per ``InputPartition`` exactly like a native connector.

``synthrange`` is a deterministic synthetic-rows source (id, bucket,
val) whose values are a pure function of the row id — so a DuckDB
oracle can recompute the full table arithmetically and the connector
path (plan → partitions → per-task generators → Arrow batches) is
hash-checkable end-to-end.

Scale posture: ``partitions()`` splits the id range into equal slices —
the planner-side contract a 100 TB source uses to expose its natural
split grain (files, row groups, shard ranges); each slice generates
independently on its executor, no driver materialization.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

# Knuth's multiplicative-hash constant: val is a well-mixed but exactly
# integer-valued function of id, so engine-side sums are exact.
_MULT = 2654435761


class _Slice(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthRangeReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.num_parts = int(options.get("partitions", 8))

    def partitions(self):
        if self.num_parts < 1:
            raise ValueError(f"partitions must be >= 1, got {self.num_parts}")
        if self.n <= 0:
            return [_Slice(0, 0)]  # empty scan, not range(0, 0, 0)
        step = -(-self.n // self.num_parts)  # ceil
        return [_Slice(s, min(s + step, self.n))
                for s in range(0, self.n, step)]

    def read(self, partition: _Slice):
        for i in range(partition.start, partition.end):
            yield (i, i % 16, (i * _MULT) % 1000)


class SynthRangeDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthrange"

    def schema(self) -> str:
        return "id BIGINT, bucket INT, val BIGINT"

    def reader(self, schema) -> SynthRangeReader:
        return SynthRangeReader(self.options)


def register_synthrange(spark) -> None:
    """Idempotent registration of the custom format on a session."""
    spark.dataSource.register(SynthRangeDataSource)
