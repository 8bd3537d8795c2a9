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
Spark-hash-dependent, so queries over it can't replay the raw grid in
SQL; they register ACCURACY-CONTRACT hash oracles instead (the
estimate must sit within the CMS bound of the exact count, asserted
in-query so the driver hash pins it), with the overestimate-bound
contract additionally pinned in tests.
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


def histogram_quantile_estimates(df: DataFrame, col: str, bins: int = 256,
                                 qs=(0.25, 0.5, 0.75, 0.9, 0.99)) -> DataFrame:
    """Mergeable equi-width-histogram quantile estimates — the simplest
    member of the mergeable-quantile-sketch family (t-digest / KLL are
    variable-width refinements of the same idea): two passes, fixed
    O(bins) state, deterministic answers with a provable error bound.

    Pass 1 computes (min, max, n) — a 1-row scalar frame, broadcast.
    Pass 2 bins every value into ``bins`` equal widths and counts per
    bin; partial aggregation merges per-partition histograms for free
    (counter addition is associative), so the shuffle carries at most
    ``bins`` rows no matter the data size — the same 100 TB argument as
    the count-min grid.  The q-quantile estimate is the upper edge of
    the first bin b whose cumulative count cc(b) reaches q*n.  The
    DISCRETE q-quantile — the order statistic of 1-based rank
    r = ceil(q*n), what percentile_disc/quantile_disc return — provably
    lies in that bin (cc(b-1) < q*n <= r <= cc(b)), so
    |est - exact_disc| <= (max-min)/bins, carried as ``err_bound``.
    No such bound holds against the INTERPOLATED quantile: on sparse
    data the interpolation between adjacent order statistics can span
    arbitrarily many empty bins (e.g. values {0, 1}, q=0.1).

    All arithmetic is plain IEEE-double expressions on exact min/max, so
    an oracle running the identical formula reproduces the estimates
    bit-for-bit.  A single-valued column (max == min) degenerates every
    bin width to 0; both the bin id and the estimate are pinned to
    bin 0 / the value itself rather than evaluating 0/0.
    """
    from pyspark.sql import Window

    v = (df.select(F.col(col).cast("double").alias("x"))
         .where(F.col("x").isNotNull()))
    mm = v.agg(F.min("x").alias("lo"), F.max("x").alias("hi"),
               F.count(F.lit(1)).alias("n"))
    w = (F.col("hi") - F.col("lo")) / F.lit(float(bins))
    bin_id = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(F.floor((F.col("x") - F.col("lo")) / w).cast("long"),
                F.lit(bins - 1)))
    h = (v.crossJoin(F.broadcast(mm))
         .groupBy(bin_id.alias("bin"))
         .agg(F.count(F.lit(1)).alias("c")))
    # cumulative over <= `bins` rows: bounded by sketch width, not data
    cum = h.select("bin", F.sum("c").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    ).alias("cc"))
    qs_df = (df.sparkSession.range(1)
             .select(F.explode(F.array(*[F.lit(float(q)) for q in qs]))
                     .alias("q")))
    return (qs_df.crossJoin(F.broadcast(mm))
            .join(F.broadcast(cum), F.col("cc") >= F.col("q") * F.col("n"))
            .groupBy("q", "lo", "hi", "n")
            .agg(F.min("bin").alias("qbin"))
            .select("q",
                    (F.col("lo") + (F.col("qbin") + 1) * w).alias("est_value"),
                    w.alias("err_bound")))
