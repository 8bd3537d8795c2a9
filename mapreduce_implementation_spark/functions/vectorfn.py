"""Vector column expressions over ``array<float>`` embeddings.

Pure Catalyst higher-order functions — JVM-side, no Python in the hot
path.  (Arithmetic lambdas do NOT trigger the regex-downstream-of-explode
codegen stall documented in textfn.py; measured cold compile ~1 s.)

Elements are cast to double before multiply/accumulate so results match a
DuckDB oracle computing on ``CAST(embedding AS DOUBLE[])`` — same
accumulation order (sequential over the array), same width.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot", "l2_norm", "cosine"]


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
