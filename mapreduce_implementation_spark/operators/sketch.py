"""Count-min sketch over a key stream (Cormode & Muthukrishnan 2005) —
the mergeable frequency sketch that pairs with the registered HLL
(approx_count_distinct) and KLL-style (approx_percentile) sketches.

Why it matters at 100 TB: an exact per-key count table is O(distinct
keys) state; the CM sketch is a FIXED d x w counter grid whose row
buckets are a groupBy away — partial aggregation merges per-partition
grids for free (counter addition is associative), so the shuffle carries
at most d*w rows no matter how many keys or how skewed the stream.
Point queries overestimate only: est(k) = min_d grid[d][h_d(k)] >=
true(k), and est(k) <= true(k) + e/w * N with probability 1 - (1/2)^d
for the standard pairwise hashes (xxhash64 seeds here).

The sketch is deterministic given (seeds, d, w) but its buckets are
Spark-hash-dependent, so queries over it register rows-only; the
overestimate-bound contract is pinned in tests instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["countmin_build", "countmin_estimate"]


def countmin_build(df: DataFrame, key_col: str, depth: int = 4,
                   width: int = 1024) -> DataFrame:
    """(d, bucket, cnt) — the d x w counter grid as a DataFrame.

    One explode of the depth axis (d rows per input row — d is 4, not a
    blowup), one partially-aggregated groupBy; bucket = xxhash64(key, d)
    mod w.  Merging sketches from two corpora is UNION + the same
    groupBy — the property that makes CM the streaming/distributed
    standard.
    """
    d = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d")
    rows = df.select(F.col(key_col).alias("_k"), d)
    return (
        rows.select("d", F.pmod(F.xxhash64("_k", F.col("d")),
                                F.lit(width)).alias("bucket"))
        .groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    )


def countmin_estimate(sketch: DataFrame, keys: DataFrame, key_col: str,
                      depth: int, width: int) -> DataFrame:
    """(key, est) — point-query estimates: min over depths of the
    addressed counter.

    ``depth``/``width`` are REQUIRED and must match the build call:
    probing a w=2048 grid mod 1024 silently addresses missing buckets,
    coalesces to 0 and UNDERcounts — breaking the est >= true guarantee
    the sketch exists for.  (They are deliberately not defaulted.)

    ``keys`` is a (small) frame of keys to probe; the probe joins on
    (d, bucket) against the fixed-size grid — a broadcast of the keys
    side in any realistic use.  Empty buckets count as 0 (a key whose
    bucket nobody touched has true count 0).
    """
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("d"),
    ).select(
        "key", "d",
        F.pmod(F.xxhash64("key", F.col("d")), F.lit(width)).alias("bucket"),
    )
    joined = probes.join(sketch, ["d", "bucket"], "left").select(
        "key", F.coalesce("cnt", F.lit(0)).alias("cnt"))
    return joined.groupBy("key").agg(F.min("cnt").alias("est"))
