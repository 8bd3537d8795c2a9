"""Skew mitigation (SURVEY.md §4: the reference has none; at 100 TB hot
keys are the dominant failure mode).

Two layers:

1. AQE skew-join splitting is ON in session.py — handles moderate skew
   with zero code.
2. ``salted_join`` handles adversarial skew AQE can't: a key so hot one
   partition exceeds executor memory.  The hot side's key is salted
   k-ways; the other side is replicated k-ways per key.  Shuffle volume
   trades |small side| x k for a k-way split of the hot partition.

``salted_aggregate`` exists for completeness but documents that Spark's
partial aggregation already neutralizes agg skew in most cases — use it
only for extreme single-key distributions where even the partial-agg
output for one key overwhelms a reducer (e.g. count-distinct on a hot
key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_aggregate"]


def salted_join(skewed: DataFrame, other: DataFrame, key: str,
                salt: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join where ``skewed.key`` has hot values.

    skewed side: key -> (key, salt=rand[0,k)); other side: replicated to
    all k salts.  Join on (key, salt) spreads each hot key over k
    partitions.  Row-level results identical to the plain join.

    Only inner/left are valid: right/full-outer would emit each
    unmatched right row once per salt replica.
    """
    from .joins import _fresh_name

    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    # uniquified: a caller column literally named '_salt' must survive
    # (r10 sweep of the fixed-temp-name clobber class the as-of
    # operators fixed first)
    salt_c = _fresh_name("_salt", skewed, other)
    s = skewed.withColumn(salt_c, (F.rand(seed=42) * salt).cast("int"))
    o = other.withColumn(salt_c, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = s.join(o, on=[key, salt_c], how=how)
    return out.drop(salt_c)


def salted_aggregate(df: DataFrame, key: str, aggs: list[Column],
                     partial_aliases: list[str], final_aggs: list[Column],
                     salt: int = 16) -> DataFrame:
    """Two-phase aggregation through an explicit salt: groupBy(key, salt)
    with ``aggs`` (aliased ``partial_aliases``), then groupBy(key) with
    ``final_aggs`` over the partials.  Only needed beyond Spark's built-in
    partial agg for pathological key distributions."""
    from .joins import _fresh_name

    salt_c = _fresh_name("_salt", df)
    salted = df.withColumn(salt_c, (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(key, salt_c).agg(
        *[a.alias(n) for a, n in zip(aggs, partial_aliases)])
    return partial.groupBy(key).agg(*final_aggs)
