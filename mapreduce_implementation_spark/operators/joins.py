"""Join operators — all absent from the reference (SURVEY.md §2: "no
joins"), added per the §2b extension surface (Tenzing-style SQL-on-MR).

Strategy notes for 100 TB:

* ``broadcast=`` hints mark dimension tables; Catalyst also
  auto-broadcasts under ``spark.sql.autoBroadcastJoinThreshold`` and AQE
  can upgrade a shuffle join to broadcast at runtime.
* fact-fact joins shuffle on the join key; AQE skew-join splits hot
  partitions (enabled in session.py).
* ``asof_join`` is a cogrouped merge-asof: both sides shuffle ONCE on the
  key, then each key-group is matched in sorted order via Arrow-batched
  pandas — no time-range blowup, no driver collect.  This is the (b)
  tier of the custom-operator policy (SURVEY.md §4): built-ins cannot
  express "latest row at or before t" without an O(matches) intermediate.
* ``range_join_bucketed`` turns an inequality time-window join into an
  equi-join on (key, time_bucket) + residual filter — the standard trick
  to avoid BroadcastNestedLoopJoin on big-big range predicates.
"""

from __future__ import annotations

from typing import Literal

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["join_tables", "semi_join", "anti_join", "asof_join",
           "range_join_bucketed", "interval_overlap_join",
           "bloom_prefilter", "bloom_params", "bloom_anti_join"]


def join_tables(left: DataFrame, right: DataFrame, on, how: str = "inner",
                broadcast_right: bool = False) -> DataFrame:
    right = F.broadcast(right) if broadcast_right else right
    return left.join(right, on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — right side only filters, never widens (no dup explosion)."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS."""
    return left.join(right, on=on, how="left_anti")


def _fresh_name(base: str, *dfs: DataFrame, extra: tuple = ()) -> str:
    """A temp-column name (or prefix) no caller column starts with —
    prefix-safe so derived names like ``f"{p}{c}"`` can't clobber either
    (r9 review: fixed '_by'/'_bkt'/'_matched' names shadowed caller
    data; the windowed twin's '_rv_*' family needs the prefix form).
    ``extra`` folds caller-chosen OUTPUT names into the taken set: an
    operator that later does ``withColumn(out, ...)`` must not derive a
    temp name the out-column collides with, or the trailing drop()
    deletes the caller's output (r10 ADVICE: an out like '_gt_bkt'
    collided with global_ntile's internal bucket column)."""
    cols = {c for df in dfs for c in df.columns} | set(extra)
    name = base
    while any(c.startswith(name) for c in cols):
        name += "_"
    return name


def _by_key_cast(lt, rt) -> str | None:
    """The common Spark type BOTH as-of operators normalize mixed-dtype
    by-keys to (None = already identical).  Decided ONCE from the Spark
    schema so the bucket hash / window partition and the match key read
    the same canonical representation.  Targets: both-integral ->
    bigint (exact); int/float mixes -> double (SQL's own bigint=double
    cast; >2^53 aliasing is SQL's, not ours); both-decimal -> the
    widened common decimal, REFUSED when the widened precision would
    exceed decimal's 38-digit capacity (r9 ADVICE: a capped min(p,38)
    cast overflows 37-digit keys to NULL under non-ANSI, and NULL
    by-keys then falsely match inside pandas merge_asof); decimal mixed
    with non-decimal -> loud error (SQL compares decimal=bigint AS
    DECIMAL — a double cast would silently alias); date/timestamp
    mixes -> timestamp (SQL's midnight cast); anything else -> Spark's
    cast-to-string forms."""
    from pyspark.sql import types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    floating = integral + (T.FloatType, T.DoubleType)
    temporal = (T.DateType, T.TimestampType, T.TimestampNTZType)
    if lt == rt:
        return None
    if isinstance(lt, integral) and isinstance(rt, integral):
        return "bigint"
    if isinstance(lt, T.DecimalType) and isinstance(rt, T.DecimalType):
        s = max(lt.scale, rt.scale)
        p = max(lt.precision - lt.scale, rt.precision - rt.scale) + s
        if p > 38:
            raise ValueError(
                f"as-of by-keys {lt.simpleString()}/{rt.simpleString()} "
                f"widen to decimal({p},{s}) > 38 digits; the capped cast "
                "would overflow large keys to NULL — reduce scale or "
                "precision upstream")
        return f"decimal({p},{s})"
    if isinstance(lt, T.DecimalType) or isinstance(rt, T.DecimalType):
        raise ValueError(
            f"as-of by-keys mix DecimalType with {lt}/{rt}; cast "
            "both sides to one exact type upstream")
    if isinstance(lt, floating) and isinstance(rt, floating):
        return "double"
    if isinstance(lt, temporal) and isinstance(rt, temporal):
        return "timestamp"
    return "string"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_values: list[str],
    direction: Literal["backward", "forward"] = "backward",
    tolerance: str | None = None,
    how: Literal["inner", "left"] = "inner",
    num_buckets: int = 64,
) -> DataFrame:
    """For each left row, the single right row with the greatest
    ``right_on`` <= ``left_on`` (backward) within the same ``by`` key.

    Cogroup both sides on a HASHED BY-KEY BUCKET (one shuffle each),
    then ``pd.merge_asof(left_by=, right_by=)`` per bucket — the
    sorted-merge still matches strictly within the by-key, but the
    Python invocation count is ``num_buckets`` instead of one per
    distinct key: cogrouping directly on the by-key paid one pandas
    call per user (~0.5 ms each — measured ~20-30 s for ~40k users at
    sf0.1, pure per-call overhead), while the bucketed form does the
    same work in 64 vectorized calls (~3 s).  Differently-typed
    left/right by-key columns are normalized IN SPARK to one cast
    column per side, and the bucket hash, cogroup key and merge_asof
    by-key all read that same column — one canonical representation
    end-to-end (see the inline comment for the target-type table and
    the three r9 review rounds that converged here).  Default inner
    semantics: left rows with no match are dropped (mirrors DuckDB
    ASOF JOIN, the oracle); ``how="left"`` keeps them with NULL right
    values (ASOF LEFT JOIN).  NULL by-keys match nothing, enforced
    EXPLICITLY Spark-side (r8 ADVICE: pandas factorizes NaN by-keys as
    equal to each other): null-by right rows are dropped, and null-by
    left rows never enter the cogroup at all — dropped for ``inner``,
    routed AROUND the pandas stage and unioned back with NULL payload
    for ``left``.  Keeping them out of the batches matters beyond
    semantics: Arrow hands an integral column WITH NULLS to pandas as
    float64, which would alias integral keys above 2^53 in the same
    batch (r9 review finding, reproduced at num_buckets=1).

    ``tolerance`` (a pandas Timedelta string, e.g. ``"30D"``) bounds how
    stale a match may be: a right row farther than the tolerance from
    the left timestamp is no match at all — the financial-data as-of
    idiom (a quote older than the staleness budget must not price a
    trade).  Requires datetime/numeric ``on`` keys, like merge_asof.

    NULL ``on``-keys follow the same SQL rule as NULL by-keys (r10
    review): a NULL timestamp satisfies no inequality, so null-on
    right rows are dropped and null-on left rows are routed with the
    null-by left rows (NULL payload for ``left``, dropped for
    ``inner``).  Before r10 they CRASHED the cogroup — merge_asof
    rejects null merge keys.

    Tie rule (r10 review): right rows TIED on ``right_on`` within a
    by-key resolve deterministically by the remaining ``right_values``
    tuple — backward takes the greatest, forward the smallest (the row
    adjacent to the left timestamp in the (on, values) ordering),
    NULLS FIRST, matching asof_join_windowed's window order.  Without
    the tie sort the winner was whichever row arrived LAST in the
    Arrow batch — partition-order-dependent, nondeterministic run to
    run on a cluster (reproduced: same query flipped payloads under
    sortWithinPartitions).  Payload types pandas cannot compare
    vectorized (arrays) fall back to a tuple-key sort.
    """
    left_cols = left.columns
    # Mixed by-key types are normalized IN SPARK — one cast column on
    # each side, decided ONCE from the Spark schema types (shared
    # helper _by_key_cast; target-type table documented there) — and
    # the bucket hash, the cogroup key and the merge_asof by-key all
    # read that same column.  Doing it Spark-side (third r9 review
    # round) means there is exactly ONE canonical representation: no
    # pandas-vs-Spark string-repr disagreement (bool 'true' vs 'True',
    # 1e20 vs '1.0E20'), no object-dtype batches skipping an astype,
    # and no pandas ns-range overflow (Spark timestamps arrive as
    # datetime64[us]).
    by_cast = _by_key_cast(left.schema[left_by].dataType,
                           right.schema[right_by].dataType)
    # temp-column names that cannot shadow caller data (r9 review:
    # '_by'/'_bkt'/'_matched' all had the clobber risk)
    by_tmp = _fresh_name("_by", left, right)
    bkt_tmp = _fresh_name("_bkt", left, right)
    match_tmp = _fresh_name("_matched", left, right)
    lby, rby = left_by, right_by
    if by_cast is not None:
        left = left.withColumn(by_tmp, F.col(left_by).cast(by_cast))
        right = right.withColumn(by_tmp, F.col(right_by).cast(by_cast))
        lby = rby = by_tmp
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
         if f.name in left_cols]
        + [f"{f.name} {f.dataType.simpleString()}" for f in right.schema.fields
           if f.name in right_values]
    )
    tol = pd.Timedelta(tolerance) if tolerance is not None else None
    lsel = left_cols + ([by_tmp] if by_cast is not None else [])
    rcols = [rby, right_on] + [c for c in right_values
                               if c not in (right_on, rby)]
    # deterministic tie order: stable-sort the right side by the FULL
    # (on, values) tuple so merge_asof's pick among equal timestamps is
    # a property of the DATA, not of Arrow batch arrival order
    rsort = [right_on] + [c for c in right_values if c != right_on]

    def _tuple_key(s: pd.Series) -> pd.Series:
        # arrays arrive as np.ndarray (unsortable vectorized); tuples
        # compare elementwise like Spark's array ordering
        import numpy as np
        return s.map(lambda v: tuple(v.tolist())
                     if isinstance(v, np.ndarray) else v)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf[lsel]
        if len(lpdf) == 0:
            return pd.DataFrame(columns=left_cols + right_values)
        if len(rpdf) == 0:
            if how == "left":
                out = lpdf.copy()
                for c in right_values:
                    out[c] = None
                return out[left_cols + right_values]
            return pd.DataFrame(columns=left_cols + right_values).iloc[:0]
        # merge_asof with by-keys wants both frames sorted by the ON
        # key only (per-key matching happens inside the merge); the
        # by-key dtypes agree by construction (same Spark type, or the
        # shared Spark-side cast column), so no pandas-side casts
        lpdf = lpdf.sort_values(left_on, kind="mergesort")
        rpdf = rpdf[rcols]
        try:
            rpdf = rpdf.sort_values(rsort, kind="mergesort",
                                    na_position="first")
        except (TypeError, ValueError):
            rpdf = rpdf.sort_values(rsort, kind="mergesort",
                                    na_position="first", key=_tuple_key)
        # match indicator: dropping on a payload column would wrongly
        # discard matched rows whose payload is legitimately NULL.
        rpdf = rpdf.assign(**{match_tmp: 1})
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_on, right_on=right_on,
            left_by=lby, right_by=rby,
            direction=direction, suffixes=("", "_r"),
            tolerance=tol,
        )
        if how == "inner":
            merged = merged[merged[match_tmp].notna()]
        return merged[left_cols + right_values]

    # NULL by-keys match nothing (SQL equality semantics) and must
    # never reach a pandas batch (Arrow float64s a null-carrying
    # integral column, aliasing >2^53 keys in the SAME batch before
    # any dtype fix could run): drop null-by right rows, and route
    # null-by left rows around the cogroup — dropped for inner,
    # unioned back with NULL payload for left.  NULL ON-keys get the
    # same routing (r10 review: a NULL timestamp satisfies no
    # inequality — and merge_asof CRASHES on null merge keys, so
    # before this they were a live error, not just a semantic gap).
    # Filters read the ORIGINAL key columns: the normalized cast never
    # nulls a non-null key (widening casts only), so the two agree.
    l_null = F.col(left_by).isNull() | F.col(left_on).isNull()
    right = right.filter(F.col(right_by).isNotNull()
                         & F.col(right_on).isNotNull())
    null_left = left.filter(l_null) if how == "left" else None
    left = left.filter(~l_null)

    # Bucket on the SAME normalized column the merge keys on — one
    # canonical representation end-to-end, so keys that compare equal
    # always co-bucket and keys that don't never falsely meet.
    bkt = lambda c: F.pmod(F.xxhash64(F.col(c).cast("string")),  # noqa: E731
                           F.lit(num_buckets))
    lb = left.withColumn(bkt_tmp, bkt(lby))
    rb = right.withColumn(bkt_tmp, bkt(rby))
    out = lb.groupBy(bkt_tmp).cogroup(rb.groupBy(bkt_tmp)).applyInPandas(
        merge, schema=out_schema
    )
    if null_left is not None:
        pad = null_left.select(
            *left_cols,
            *[F.lit(None).cast(right.schema[c].dataType).alias(c)
              for c in right_values])
        out = out.unionByName(pad)
    return out


def asof_join_windowed(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    right_values: list[str],
    tolerance_expr: str | None = None,
) -> DataFrame:
    """Backward as-of join as PURE DataFrame ops — the declarative
    scale path beside :func:`asof_join`'s pandas cogroup: union both
    sides with a sort tag, then ``last(value, ignorenulls=True)`` over
    a window partitioned by the by-key and ordered by (time, tag), so
    each left row sees the latest right row at-or-before it.  One hash
    shuffle + one in-partition sort, all JVM/codegen — no Python calls
    at all (the cogroup route pays ``num_buckets`` Arrow-batched pandas
    invocations; before r8's bucketing it paid one PER KEY — ~39 s for
    ~40k users at sf0.1 where this runs in ~2 s and the bucketed
    cogroup in ~3 s).

    LEFT semantics: every left row survives; no match (or a match
    older than ``tolerance_expr``, an INTERVAL SQL string like
    ``"INTERVAL 30 DAYS"``) yields NULL right values.  Right rows tag
    0 and left rows tag 1, so a right row AT the left timestamp
    matches (backward-inclusive).  Ties among right rows on the
    timestamp resolve deterministically by the ``right_values`` tuple
    (greatest wins, NULLS FIRST — the same rule the cogroup route
    sorts by).

    The matched payload travels as ONE STRUCT column, not one window
    expression per value column (r10 review, reproduced): per-column
    ``last(_rv_c, ignorenulls=True)`` conflates the left rows'
    placeholder NULLs with a right row's GENUINE NULL payload field,
    so a latest-match row carrying a NULL field silently resurrected
    the PREVIOUS match's value for that column — a Frankenstein row
    mixing two right rows.  A struct from a right row is never NULL
    even when every field is, so ``last(struct, ignorenulls=True)``
    skips exactly the placeholders and preserves row unity.

    Same key contract as :func:`asof_join` (the two operators
    implement ONE contract; a differential property test pins them
    equal): NULL by-keys AND NULL on-keys match nothing — null-keyed
    RIGHT rows are filtered out before the union, and null-keyed LEFT
    rows are filtered out too and unioned back AFTER the window with
    NULL payload (the cogroup route's filter-and-pad idiom, adopted
    here in r11 per the r10 verdict: before, null-keyed left rows
    rode THROUGH the window — semantically correct, since a null
    by-key partitions away from every right row, but every such row
    landed in ONE window partition, a skewed no-op sort that turns a
    90%-NULL-by corpus into a single hot task at scale).  The pad leg
    is a second scan of the left input plus a Union — no extra
    exchange, no extra Window, so the plan pin stays one exchange +
    one Window.  Mixed-dtype by-keys are normalized to the shared
    :func:`_by_key_cast` target so both operators co-partition keys
    identically; temp names are uniquified against caller columns.

    NaN tie order (r10 ADVICE): the tie-break ORDER key maps NaN in
    top-level float/double payload fields to NULL (``nanvl``) before
    the struct comparison, because the cogroup route's pandas sort
    treats NaN as NA (``na_position='first'`` — smallest) while
    Spark's raw struct ordering sorts NaN GREATER than any value —
    without the normalization the two routes pick different rows among
    timestamp ties.  The matched PAYLOAD still carries the original
    NaN.  Residual, documented out of the tie contract: a NULL-payload
    row and a NaN-payload row tied on everything else are
    indistinguishable to pandas (Arrow conflates NULL/NaN in float
    columns), so their relative order is unspecified on both routes;
    NaN inside NESTED arrays is likewise not normalized.
    """
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    rv = [c for c in right_values]
    if tolerance_expr is not None and right_on not in rv:
        raise ValueError(
            "tolerance_expr needs the matched timestamp: include "
            f"{right_on!r} in right_values")
    by_cast = _by_key_cast(left.schema[left_by].dataType,
                           right.schema[right_by].dataType)
    lby = F.col(left_by).cast(by_cast) if by_cast else F.col(left_by)
    rby = F.col(right_by).cast(by_cast) if by_cast else F.col(right_by)
    by_c = _fresh_name("_by", left, right)
    t_c = _fresh_name("_t", left, right)
    side_c = _fresh_name("_side", left, right)
    rv_c = _fresh_name("_rv", left, right)
    m_c = _fresh_name("_m", left, right)
    rv_t = T.StructType([right.schema[c] for c in rv])
    right = right.filter(F.col(right_by).isNotNull()
                         & F.col(right_on).isNotNull())
    # null-keyed LEFT rows skip the shuffle+window entirely (they can
    # never match) and are padded back with NULL payload post-window —
    # same idiom as the cogroup route; avoids the one-hot-partition
    # skew when a large left fraction carries NULL keys.
    l_null = F.col(left_by).isNull() | F.col(left_on).isNull()
    null_left = left.filter(l_null)
    left = left.filter(~l_null)
    l_tag = left.select(
        lby.alias(by_c), F.col(left_on).alias(t_c),
        F.lit(1).alias(side_c),
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(rv_t).alias(rv_c),
    )
    r_tag = right.select(
        rby.alias(by_c), F.col(right_on).alias(t_c),
        F.lit(0).alias(side_c),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns],
        F.struct(*[F.col(c).alias(c) for c in rv]).alias(rv_c),
    )
    # Tie-break ORDER key: the payload struct with NaN in top-level
    # float/double fields mapped to NULL (nanvl), so Spark's struct
    # comparison ranks NaN smallest — matching the cogroup route's
    # pandas sort (na_position='first' treats NaN as NA).  Raw Spark
    # ordering would rank NaN GREATEST and the two routes would pick
    # different rows among timestamp ties (r10 ADVICE).  The payload
    # column itself is untouched.  (For LEFT rows the key becomes a
    # struct of NULLs instead of a NULL struct — irrelevant: the side
    # tag already separates sides, and tied left rows are order-
    # insensitive, each being its own output row.)
    flt = (T.FloatType, T.DoubleType)
    rv_ord = F.struct(*[
        (F.nanvl(F.col(rv_c).getField(f.name),
                 F.lit(None).cast(f.dataType)) if isinstance(f.dataType, flt)
         else F.col(rv_c).getField(f.name)).alias(f.name)
        for f in rv_t.fields])
    w = (Window.partitionBy(by_c)
         .orderBy(F.col(t_c).asc(), F.col(side_c).asc(),
                  rv_ord.asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    matched = l_tag.unionByName(r_tag, allowMissingColumns=False).select(
        "*", F.last(rv_c, ignorenulls=True).over(w).alias(m_c),
    ).where(F.col(side_c) == 1)
    keep = F.lit(True)
    if tolerance_expr is not None:
        keep = (F.col(m_c).getField(right_on).isNotNull()
                & (F.col(t_c) - F.col(m_c).getField(right_on)
                   <= F.expr(tolerance_expr)))
    out_cols = [F.col(c) for c in left.columns] + [
        F.when(keep, F.col(m_c).getField(c)).alias(c) for c in rv]
    out = matched.select(*out_cols)
    pad = null_left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in rv])
    return out.unionByName(pad)


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs (l, r) with same ``key`` and ``l.ts < r.ts <= l.ts + window``.

    Equi-join on (key, bucket) with the left side exploded to its two
    candidate buckets, then a residual range filter — shuffle volume is
    O(2·|left| + |right|) instead of the O(|left|·|right|/keys) of a
    naive inequality join.
    """
    bucket = lambda c: F.floor(F.unix_timestamp(F.col(c)) / window_seconds)  # noqa: E731
    bkt = _fresh_name("_bkt", left, right)
    l = left.withColumn(
        bkt, F.explode(F.array(bucket(left_ts), bucket(left_ts) + 1))
    )
    r = right.withColumn(bkt, bucket(right_ts))
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return (
        l.alias("l")
        .join(r.alias("r"), on=[F.col(f"l.{bkt}") == F.col(f"r.{bkt}"), F.col(f"l.{key}") == F.col(f"r.{key}")])
        .where((rcol > lcol) & (rcol <= lcol + F.expr(f"INTERVAL {window_seconds} SECONDS")))
        .drop(bkt)
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket_seconds: int,
) -> DataFrame:
    """All pairs whose closed intervals ``[l_start, l_end]`` and
    ``[r_start, r_end]`` OVERLAP — without a BroadcastNestedLoopJoin.

    Both sides explode each interval into the time buckets it covers
    (``sequence`` over ``floor(unix_ts / bucket_seconds)``), equi-join
    on the bucket, apply the residual overlap predicate, and keep each
    pair exactly ONCE by requiring the joined bucket to be the FIRST
    bucket both intervals are live in (``greatest`` of the two start
    buckets — overlap guarantees that bucket is common).  Shuffle volume
    is O(sum of interval lengths / bucket) instead of |L| x |R|; pick
    ``bucket_seconds`` near the typical interval length so each interval
    explodes to a handful of buckets.  Column names on the two sides
    must be disjoint (rename before calling — the join returns both
    sides' columns).  Timestamps compare exactly; touching endpoints
    (l_end == r_start) count as overlap, matching SQL's
    ``a.s <= b.e AND b.s <= a.e``.
    """
    def bkt(c: str):
        return F.floor(F.unix_timestamp(F.col(c)) / bucket_seconds)

    bkt_c = _fresh_name("_bkt", left, right)
    l = left.withColumn(bkt_c, F.explode(F.sequence(bkt(l_start), bkt(l_end))))
    r = right.withColumn(bkt_c, F.explode(F.sequence(bkt(r_start), bkt(r_end))))
    first_common = F.greatest(bkt(l_start), bkt(r_start))
    return (
        l.join(r, bkt_c)
        .where((F.col(l_start) <= F.col(r_end))
               & (F.col(r_start) <= F.col(l_end))
               & (F.col(bkt_c) == first_common))
        .drop(bkt_c)
    )


def bloom_prefilter(fact: DataFrame, keys: DataFrame, fact_key: str,
                    dim_key: str, num_bits: int = 1 << 16,
                    num_hashes: int = 4) -> DataFrame:
    """Semi-join reduction: drop ``fact`` rows whose ``fact_key`` CANNOT
    match any ``keys.dim_key`` before the join's shuffle, using a Bloom
    filter built as a tiny aggregate and shipped as ONE broadcast row.

    The scale case this serves: a filtered dimension subset that is too
    big to broadcast-join at 100 TB (tens of millions of keys) still
    compresses to a kilobytes-scale bitmap, and applying that bitmap
    map-side cuts the fact table's shuffle volume to matching rows plus
    a controlled false-positive trickle.  Semantics are TRANSPARENT: a
    Bloom filter has no false negatives, so `prefilter -> real join`
    returns exactly the rows of the plain join (oracles compare against
    the plain join).  False positives only cost shuffle bytes and are
    removed by the real join.

    Plan shape: build = one pass over ``keys`` exploding each key to its
    ``num_hashes`` bit positions, ``bit_or`` per 64-bit word
    (<= num_bits/64 rows), collapsed to a single ``map<word, bits>``
    row.  Probe = crossJoin(broadcast(1 row)) + a pure-expression filter
    (xxhash64 + element_at + shift/mask, whole-stage codegen, no UDF).
    Size ``num_bits ~ -n * ln(p) / ln(2)^2`` for n keys at target FPR p
    (default 64 Kbit ~ 6k keys at 1%); the map never exceeds
    ``num_bits / 64`` entries regardless of key count.

    Key typing: xxhash64 is type-sensitive, so mixed-width key columns
    (int fact key vs bigint dim key) would hash differently on the two
    sides and silently DROP true matches that a plain equi-join's
    implicit coercion would keep.  Integral pairs are therefore both
    canonicalized to BIGINT before hashing (coercion-equivalent, no
    false negatives); any other type combination must match exactly.
    """
    m, k = int(num_bits), int(num_hashes)
    integral = {"tinyint", "smallint", "int", "bigint"}
    ftype = dict(fact.dtypes)[fact_key]
    dtype = dict(keys.dtypes)[dim_key]
    if ftype in integral and dtype in integral:
        fact_col = F.col(fact_key).cast("bigint")
        dim_col = F.col(dim_key).cast("bigint")
    elif ftype == dtype:
        fact_col, dim_col = F.col(fact_key), F.col(dim_key)
    else:
        raise TypeError(
            f"bloom_prefilter key types must match (or both be integral): "
            f"fact.{fact_key} is {ftype}, keys.{dim_key} is {dtype} — "
            "xxhash64 over mismatched types silently loses matches")
    # probe-side temp names are uniquified against the fact schema: the
    # broadcast map and the k probe positions land ON the caller's
    # frame, where fixed '_bloom'/'_p{j}' names would clobber (and then
    # drop) caller columns.  Build-side names (_pos/_w/_b/_bits) live
    # only on derived select() frames — no caller exposure.
    bloom_c = _fresh_name("_bloom", fact)
    p = _fresh_name("_p", fact)  # prefix-safe for _p0.._p{k-1}
    bloom = _bloom_bitmap(keys, dim_col, m, k, bloom_c)
    out = _bloom_positions(fact.crossJoin(F.broadcast(bloom)),
                           fact_col, p, m, k)
    return (out.where(F.expr(_bloom_probe_sql(bloom_c, p, k)))
            .drop(bloom_c, *[f"{p}{j}" for j in range(k)]))


def _bloom_bitmap(keys: DataFrame, key_col: Column, m: int, k: int,
                  out_name: str) -> DataFrame:
    """One-row ``map<word_idx, bits>`` Bloom bitmap over ``key_col`` —
    the build half shared by bloom_prefilter and bloom_anti_join (the
    probe half is _bloom_positions + _bloom_probe_sql; the seed mixing
    ``xxhash64(key, lit(j))`` must match on both halves)."""
    pos = [F.pmod(F.xxhash64(key_col, F.lit(j)), F.lit(m))
           for j in range(k)]
    return (
        keys.select(F.explode(F.array(*pos)).alias("_pos"))
        .select(F.shiftright(F.col("_pos"), 6).alias("_w"),
                F.pmod(F.col("_pos"), F.lit(64)).alias("_b"))
        .groupBy("_w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_b AS INT)))")
             .alias("_bits"))
        .agg(F.map_from_entries(F.collect_list(F.struct("_w", "_bits")))
             .alias(out_name))
    )


def _bloom_positions(df: DataFrame, key_col: Column, p: str,
                     m: int, k: int) -> DataFrame:
    for j in range(k):
        df = df.withColumn(
            f"{p}{j}", F.pmod(F.xxhash64(key_col, F.lit(j)), F.lit(m)))
    return df


def _bloom_probe_sql(bloom_c: str, p: str, k: int) -> str:
    return " AND ".join(
        f"((shiftright(coalesce(element_at(`{bloom_c}`, shiftright(`{p}{j}`, 6)),"
        f" CAST(0 AS BIGINT)), CAST(pmod(`{p}{j}`, 64) AS INT)) & 1) = 1)"
        for j in range(k))


def _bloom_probe_sql_dense(bloom_c: str, p: str, k: int) -> str:
    """Probe variant for a DENSE ``array<long>`` bitmap column (the map
    form above is for _bloom_bitmap's sparse map) — 1-based element_at
    with try_element_at/coalesce so an out-of-range word (only possible
    on a mis-sized bitmap) reads as 0 bits -> might_contain FALSE, a
    loud wrong answer in tests rather than a row that silently vanishes
    from both filter branches via three-valued logic (r12 review).  The
    seed mixing / word packing contract is _bloom_bitmap's; keep the
    two probe forms next to each other so a build change can't drift
    past one of them."""
    return " AND ".join(
        f"((shiftright(coalesce(try_element_at(`{bloom_c}`, "
        f"CAST(shiftright(`{p}{j}`, 6) AS INT) + 1), CAST(0 AS BIGINT)), "
        f"CAST(pmod(`{p}{j}`, 64) AS INT)) & 1) = 1)"
        for j in range(k))


def bloom_params(n_keys: int, fpr: float = 0.01) -> tuple[int, int]:
    """Textbook Bloom sizing: bits m = -n ln p / ln^2 2 (rounded up to a
    multiple of 64), hashes k = (m/n) ln 2.  Scale rule: size for the
    build side's distinct-key count — at 10^10 seen URLs and 1% FPR the
    bitmap is ~12 GB, past comfortable broadcast range, so shard the
    history by key range and build one filter per shard (each probe
    key touches exactly one shard's filter)."""
    import math as _m

    n = max(n_keys, 1)
    m = int(_m.ceil(-n * _m.log(fpr) / (_m.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * _m.log(2)))
    return m, k


def bloom_anti_join(incoming: DataFrame, history: DataFrame, key_col: str,
                    num_bits: int = 1 << 16, num_hashes: int = 4,
                    broadcast_recheck: bool = True) -> DataFrame:
    """Rows of ``incoming`` whose ``key_col`` does NOT appear in
    ``history`` (both frames carry the key under the same name) — the
    crawl-frontier seen-key dedup shape.  Output-identical to a plain
    left-anti join: the Bloom probe has no false NEGATIVES (a
    definitely-unseen row takes the cheap path directly) and its false
    positives are re-checked exactly, so the filter only ever moves
    rows between paths, never changes the answer.

    At crawl shape (incoming batch << history) the exact recheck never
    shuffles the history: probe survivors are few, so the recheck runs
    as history-scan LEFT SEMI broadcast(survivor keys) -> confirmed-seen
    keys (bounded by the survivor count) -> survivors LEFT ANTI
    broadcast(confirmed) — history is map-scanned once for the bitmap
    and once for the semi probe, and nothing history-sized ever crosses
    an exchange.  ``broadcast_recheck=False`` falls back to the plain
    shuffle anti-join for survivor sets too large to broadcast (the
    planner can't know; the caller does).  NULL incoming keys follow
    anti-join semantics (NULL matches nothing => kept); NULL history
    keys are ignored.  Size ``num_bits``/``num_hashes`` with
    ``bloom_params`` from the history's distinct-key estimate."""
    from .caching import tracked_persist

    m, k = int(num_bits), int(num_hashes)
    itype = dict(incoming.dtypes)[key_col]
    htype = dict(history.dtypes)[key_col]
    integral = {"tinyint", "smallint", "int", "bigint"}
    floating = {"float", "double"}
    if itype in integral and htype in integral:
        inc_col = F.col(key_col).cast("bigint")
        hist_col = F.col(key_col).cast("bigint")
    elif itype in floating and htype in floating:
        # Spark join keys normalize -0.0 = 0.0 and NaN = NaN, but
        # xxhash64 hashes raw bits, so an un-normalized probe would
        # take the 'definitely unseen' path for a history 0.0 vs
        # incoming -0.0 (a false NEGATIVE, breaking the exactness
        # guarantee — r12 ADVICE).  nanvl canonicalizes every NaN bit
        # pattern; + 0.0 maps -0.0 to 0.0 and leaves everything else
        # (including the canonical NaN) bit-stable.
        def _norm(c: Column) -> Column:
            d = c.cast("double")
            return F.nanvl(d, F.lit(float("nan"))) + F.lit(0.0)
        inc_col = _norm(F.col(key_col))
        hist_col = _norm(F.col(key_col))
    elif itype == htype:
        inc_col, hist_col = F.col(key_col), F.col(key_col)
    else:
        raise TypeError(
            f"bloom_anti_join key types must match (or both be integral, "
            f"or both be floating): "
            f"incoming.{key_col} is {itype}, history.{key_col} is {htype} — "
            "xxhash64 over mismatched types silently loses matches")
    bloom_c = _fresh_name("_bloom", incoming)
    p = _fresh_name("_p", incoming)
    # NOT persisted: the bitmap's broadcast exchange is plan-identical
    # in the fresh and survivor branches, so exchange reuse
    # (spark.sql.exchange.reuse) computes it once per action anyway —
    # an explicit persist only adds a materialization barrier (measured
    # +0.8 s per run at sf0.1 for zero saved work).
    bloom = _bloom_bitmap(
        history.where(F.col(key_col).isNotNull()), hist_col, m, k, bloom_c)
    probed = _bloom_positions(incoming.crossJoin(F.broadcast(bloom)),
                              inc_col, p, m, k)
    might = F.expr(_bloom_probe_sql(bloom_c, p, k))
    drop = [bloom_c, *[f"{p}{j}" for j in range(k)]]
    keep_null = F.col(key_col).isNull()
    fresh = probed.where(keep_null | ~might).drop(*drop)
    survivors = probed.where(~keep_null & might).drop(*drop)
    if broadcast_recheck:
        # persisted only on this route, which consumes survivors twice
        # (the broadcast key set + the final anti-join left); the
        # fallback route has a single consumer, where a persist is a
        # pure materialization barrier (r12 review)
        survivors = tracked_persist(survivors)
        surv_keys = survivors.select(key_col).distinct()
        confirmed = (history.select(key_col)
                     .join(F.broadcast(surv_keys), key_col, "left_semi")
                     .distinct())
        new = survivors.join(F.broadcast(confirmed), key_col, "left_anti")
    else:
        new = survivors.join(history.select(key_col), key_col, "left_anti")
    return fresh.unionByName(new)


def bloom_anti_join_rolling(ledger: DataFrame, key_col: str,
                            window_col: str, lookback: int,
                            num_bits: int = 1 << 16,
                            num_hashes: int = 4,
                            broadcast_recheck: bool = True) -> DataFrame:
    """Rolling-history frontier dedup — the incremental-crawl twin of
    ``bloom_anti_join`` (r12 VERDICT item 5): ``ledger`` holds one row
    per (window, key) sighting (``window_col`` an integer epoch — day
    index, week index); a row survives iff its key does NOT appear in
    any of the ``lookback`` windows strictly before its own, i.e.
    exact output of the windowed anti-join

        ledger l ANTI JOIN ledger h
          ON h.key = l.key AND h.window IN [l.window-lookback, l.window-1]

    with the same no-false-negative / exact-recheck structure as the
    static operator, so a plain windowed anti-join oracle is EXACT.

    Shape at 100 TB — per-window bitmaps, history NEVER shuffles:

    * ONE pass over the ledger builds a sparse ``map<word,bits>``
      bitmap PER WINDOW (groupBy(window, word) bit_or): the exchange
      carries at most |windows| x m/64 word partials (map-side
      combined), never a ledger row;
    * each window's TRAILING bitmap is the bit_or of its ``lookback``
      predecessors — a range self-join on the |windows|-row bitmap
      frame (dimension-sized by construction: windows are calendar
      epochs), merged by re-aggregating exploded word entries;
    * probes run map-side via broadcast of the |windows| trailing
      bitmaps; only probe survivors (true dups + false positives)
      reach the exact recheck, which scans the ledger once against
      BROADCAST survivor pairs (key equality + window-range residual
      inside a broadcast hash join) — bounded by the survivor count.

    At the 10^10-keys-per-window regime, shard each window's bitmap by
    key range exactly as ``bloom_params`` documents for the static
    ledger.  Survivor volume is DATA-DEPENDENT (all true within-window
    dups plus false positives): on a high-duplication ledger it is
    ledger-sized, so ``broadcast_recheck=False`` falls back to a
    shuffled windowed anti-join of survivors against the keyed ledger
    — same escape hatch as ``bloom_anti_join`` (the planner can't know
    the duplication rate; the caller does — r13 ADVICE).  NULL keys
    are kept, and so are NULL-window rows (both
    anti-join semantics: NULL matches nothing, so no trailing history
    can contain them — identical to what the exact windowed anti-join
    does with a NULL on either side of its range predicate); neither
    enters a bitmap.
    """
    from .caching import tracked_persist

    m, k = int(num_bits), int(num_hashes)
    if int(lookback) < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    wtypes = dict(ledger.dtypes)
    if wtypes[window_col] not in {"tinyint", "smallint", "int", "bigint"}:
        raise TypeError(
            f"window_col {window_col!r} must be integral (an epoch "
            f"index), got {wtypes[window_col]} — cast dates with "
            "datediff() first so the trailing range is well-defined")
    keyed = ledger.where(F.col(key_col).isNotNull()
                         & F.col(window_col).isNotNull())
    w = F.col(window_col)
    # every temp column that lands on (or joins against) the caller's
    # frame is uniquified — the r9-review rule above: a ledger already
    # carrying a column with the temp's name must not become ambiguous
    bm_c = _fresh_name("_bm", ledger)
    p = _fresh_name("_p", ledger)
    tw = _fresh_name("_tw", ledger)
    sw = _fresh_name("_sw", ledger)
    sk = _fresh_name("_sk", ledger)
    hw = _fresh_name("_hw", ledger)
    hk = _fresh_name("_hk", ledger)

    # per-window sparse bitmaps: ONE pass over the keyed ledger ->
    # (window, word, bits) partials.  NULL-window rows never enter a
    # bitmap (no range predicate could match them anyway).
    pos = [F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m))
           for j in range(k)]
    per_win = (
        keyed.select(w.alias("_win"),
                     F.explode(F.array(*pos)).alias("_pos"))
        .select("_win", F.shiftright(F.col("_pos"), 6).alias("_w"),
                F.pmod(F.col("_pos"), F.lit(64)).alias("_b"))
        .groupBy("_win", "_w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_b AS INT)))")
             .alias("_bits")))
    # trailing bitmap per target window: range self-join of the tiny
    # per-window word frame, re-aggregated by word (bit_or is
    # associative, so merging word partials == merging bitmaps).  The
    # target-window set comes from per_win itself — deriving it from
    # the ledger would re-scan data to enumerate a dimension-sized set
    # (r13 review).
    targets = per_win.select(F.col("_win").alias(tw)).distinct()
    trailing = (
        targets.join(
            F.broadcast(per_win),
            (F.col("_win") >= F.col(tw) - F.lit(int(lookback)))
            & (F.col("_win") <= F.col(tw) - F.lit(1)), "left")
        .groupBy(tw, "_w")
        .agg(F.expr("bit_or(_bits)").alias("_bits"))
        .groupBy(tw)
        .agg(F.map_from_entries(
            F.collect_list(F.when(F.col("_w").isNotNull(),
                                  F.struct("_w", "_bits"))))
             .alias(bm_c)))

    probed = _bloom_positions(
        ledger.join(F.broadcast(trailing), w == F.col(tw), "left"),
        F.col(key_col), p, m, k)
    might = F.expr(_bloom_probe_sql(bm_c, p, k)) & F.col(tw).isNotNull()
    drop = [tw, bm_c, *[f"{p}{j}" for j in range(k)]]
    keep_null = F.col(key_col).isNull()
    fresh = probed.where(keep_null | ~might).drop(*drop)
    survivors = probed.where(~keep_null & might).drop(*drop)

    if broadcast_recheck:
        # persisted only on this route, which consumes survivors twice
        # (the broadcast pair set + the final anti-join left); the
        # shuffled fallback has a single consumer, where a persist is
        # a pure materialization barrier (same rule as the static op)
        survivors = tracked_persist(survivors)
        surv_pairs = survivors.select(w.alias(sw),
                                      F.col(key_col).alias(sk)).distinct()
        confirmed = (
            keyed.select(w.alias(hw), F.col(key_col).alias(hk))
            .join(F.broadcast(surv_pairs),
                  (F.col(hk) == F.col(sk))
                  & (F.col(hw) >= F.col(sw) - F.lit(int(lookback)))
                  & (F.col(hw) <= F.col(sw) - F.lit(1)))
            .select(sw, sk).distinct())
        new = survivors.join(
            F.broadcast(confirmed),
            (w == F.col(sw)) & (F.col(key_col) == F.col(sk)),
            "left_anti")
    else:
        # shuffled windowed anti-join: key equality hashes both sides,
        # the window range rides as a residual — nothing broadcasts,
        # so a ledger-sized survivor set cannot OOM the driver
        new = survivors.join(
            keyed.select(w.alias(hw), F.col(key_col).alias(hk)),
            (F.col(key_col) == F.col(hk))
            & (F.col(hw) >= w - F.lit(int(lookback)))
            & (F.col(hw) <= w - F.lit(1)),
            "left_anti")
    return fresh.unionByName(new)
