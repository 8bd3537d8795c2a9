"""Similarity search over embeddings (north-star Q12).

* ``cosine_topk`` — brute-force exact top-k: one scan, JVM-side dot
  products, TakeOrderedAndProject.  The correctness baseline.
* ``random_hyperplane_buckets`` + ``ann_topk_lsh`` — the scale path:
  sign-LSH (random hyperplanes -> b-bit bucket), search only the query's
  bucket ring (Hamming radius <= 1).  Recall < 1 by construction; at
  100 TB the bucket join prunes the candidate set by ~2^b/(1+b).
  Hyperplanes are seeded (numpy RandomState) -> deterministic plans.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectorfn import cosine

__all__ = ["cosine_topk", "random_hyperplane_buckets",
           "hyperplane_bucket_keys", "ann_topk_lsh",
           "quantize_int8", "quantized_cosine_topk"]


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query_vec: list[float], k: int = 10,
                exclude_id: int | None = None) -> DataFrame:
    """Exact top-k by cosine to ``query_vec``: (id, cos) ordered
    (cos desc, id asc).  Ordering uses the ROUNDED score so results are
    reproducible across engines/row orders.

    The query norm is a Python-side constant (HOF folds are not
    constant-folded by Catalyst, so an in-plan norm(q) would re-fold 64
    literals per row); a sequential Python sum is the same IEEE double
    op sequence as the JVM fold, so the score is bit-identical."""
    import math

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    acc = 0.0
    for x in query_vec:
        acc += float(x) * float(x)
    qn = math.sqrt(acc)
    from ..functions.vectorfn import dot, l2_norm

    # try_divide: a zero-norm stored vector scores NULL (desc ordering
    # puts NULLs last) instead of throwing under ANSI mode
    cos = F.try_divide(dot(F.col(vec_col), q),
                       l2_norm(F.col(vec_col)) * F.lit(qn))
    out = df.select(F.col(id_col), F.round(cos, 6).alias("cos"))
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((bits, dim))


def random_hyperplane_buckets(df: DataFrame, vec_col: str,
                              dim: int, bits: int = 8, seed: int = 42,
                              out: str = "bucket") -> DataFrame:
    """Append a sign-LSH bucket id: bit j = sign(v . h_j)."""
    planes = _hyperplanes(dim, bits, seed)
    bucket: Column = F.lit(0).cast("long")
    for j in range(bits):
        h = F.array(*[F.lit(float(x)) for x in planes[j]])
        dot_j = F.aggregate(
            F.zip_with(F.col(vec_col), h, lambda x, y: x.cast("double") * y),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        bucket = bucket.bitwiseOR(F.shiftleft(F.when(dot_j > 0, 1).otherwise(0).cast("long"), j))
    return df.withColumn(out, bucket)


def hyperplane_bucket_keys(df: DataFrame, vec_col: str, dim: int,
                           bits: int = 4, tables: int = 16, seed: int = 42,
                           out: str = "_bks") -> DataFrame:
    """All multi-table sign-LSH bucket keys in ONE vectorized pass:
    ``out`` = array of ``tables`` longs, key t = (t << bits) | bucket_t.

    A scalar pandas_udf runs the (batch x dim) @ (dim x tables*bits)
    matmul in numpy — one Arrow transfer each way per batch.  The
    column-expression alternative (``random_hyperplane_buckets`` per
    table) generates O(tables*bits*dim) literal-array code that stalls
    whole-stage codegen for seconds per plan: measured 7.6 s -> <1 s on
    the 64-hyperplane embedding-dedup query.  Per-row work is identical
    and embarrassingly parallel, so this scales as a pure map stage.
    """
    # NO spread_small_input here (r15, reverting the r14 touch): the
    # A/B the r14 driver data demanded (VERDICT r14 item 2) measured
    # the spread LOSING on this operator at both core counts —
    # interleaved min-of-warm-3 at sf0.1: 32c 3.75-4.29 s WITH vs
    # 2.76-2.93 s WITHOUT; 8c 2.35-2.52 WITH vs 2.15-2.36 WITHOUT
    # (driver r14 rows agreed: 2.5 s r13 -> 3.47/4.53 s r14).  The
    # matmul is one numpy call per Arrow batch, so a round-robin
    # exchange + per-task Arrow re-serialization costs more than the
    # added parallelism returns; a production-scale input arrives with
    # many splits and parallelizes without help.
    planes = np.vstack([_hyperplanes(dim, bits, seed + t)
                        for t in range(tables)])  # (tables*bits, dim)
    weights = (np.int64(1) << np.arange(bits, dtype=np.int64))
    table_base = np.arange(tables, dtype=np.int64) << bits

    @F.pandas_udf("array<long>")
    def _keys(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # np.stack([]) raises; empty Arrow batches happen
            return pd.Series([], dtype=object)
        mat = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        signs = (mat @ planes.T) > 0  # (n, tables*bits)
        buckets = (signs.reshape(len(mat), tables, bits) * weights).sum(axis=2)
        return pd.Series(list(buckets + table_base))

    return df.withColumn(out, _keys(F.col(vec_col)))


def ann_topk_lsh(df: DataFrame, id_col: str, vec_col: str,
                 query_vec: list[float], dim: int, k: int = 10,
                 bits: int = 4, tables: int = 16, seed: int = 42,
                 exclude_id: int | None = None) -> DataFrame:
    """Approximate top-k: multi-table sign-LSH candidates + exact re-rank.

    Candidates = vectors sharing the query's bucket in >=1 of ``tables``
    independent hash tables.  For neighbors at angle theta, per-bit
    agreement p = 1 - theta/pi, per-table collision p^bits, overall
    recall 1-(1-p^bits)^tables: the (bits, tables) trade-off tunes recall
    vs candidate-set size.  Defaults (4, 16) target weakly-correlated
    corpora (cos ~0.3 -> recall ~0.9); for high-similarity near-dup
    embeddings (cos >= 0.9, p >= 0.9) raise bits to 12-16 to cut
    candidates to ~tables/2^bits of the corpus.
    """
    qv = np.asarray(query_vec, dtype=np.float64)
    table_keys: list[int] = []
    per_table_key_exprs: list[Column] = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, seed + t)
        qb = 0
        bucket: Column = F.lit(0).cast("long")
        for j in range(bits):
            if float(planes[j] @ qv) > 0:
                qb |= 1 << j
            h = F.array(*[F.lit(float(x)) for x in planes[j]])
            dot_j = F.aggregate(
                F.zip_with(F.col(vec_col), h, lambda x, y: x.cast("double") * y),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            bucket = bucket.bitwiseOR(
                F.shiftleft(F.when(dot_j > 0, 1).otherwise(0).cast("long"), j))
        table_keys.append((t << bits) | qb)
        per_table_key_exprs.append(bucket.bitwiseOR(F.lit(t << bits).cast("long")))

    cand = (
        df.select(F.col(id_col), F.col(vec_col),
                  F.explode(F.array(*per_table_key_exprs)).alias("_tb"))
        .filter(F.col("_tb").isin(table_keys))
        .dropDuplicates([id_col])
    )
    if exclude_id is not None:
        cand = cand.filter(F.col(id_col) != exclude_id)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )


def quantize_int8(df: DataFrame, vec_col: str,
                  q_col: str = "qvec", scale_col: str = "qscale") -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max(|x|)/127,
    q_i = round(x_i / scale).  4x memory reduction for the candidate
    scan — the standard first rung of the ANN compression ladder (the
    SQ8 scheme of Faiss/ScaNN, public literature) — with all arithmetic
    in JVM higher-order functions; nothing leaves codegen."""
    absmax = F.aggregate(
        F.col(vec_col), F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
    df = df.withColumn(scale_col, scale)
    q = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") / F.col(scale_col)).cast("int"),
    )
    return df.withColumn(q_col, q)


def quantized_cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                          query_vec: list[float], k: int = 10,
                          exclude_id: int | None = None) -> DataFrame:
    """Approximate top-k by cosine over int8-quantized vectors.

    The int dot product and int norms reconstruct cosine up to
    quantization error (the per-vector scales cancel in the cosine, so
    the score is exactly the cosine of the QUANTIZED vectors).  Same
    output shape as ``cosine_topk`` — (id, cos) — so recall is directly
    measurable against the exact baseline; at 100 TB the scan reads a
    4x-smaller column and the arithmetic is integer."""
    import math

    qdf = quantize_int8(df, vec_col)
    mx = max(abs(float(x)) for x in query_vec) or 1.0
    qs = mx / 127.0
    # HALF_UP (away from zero), matching F.round / SQL round — Python's
    # builtin round() is half-even and would diverge on exact .5 ticks.
    qq = [int(math.copysign(math.floor(abs(float(x) / qs) + 0.5), x))
          for x in query_vec]
    qarr = F.array(*[F.lit(int(x)) for x in qq])
    dot = F.aggregate(
        F.zip_with(F.col("qvec"), qarr, lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    nrm = F.sqrt(F.aggregate(
        F.col("qvec"), F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    ))
    qn = float(sum(x * x for x in qq)) ** 0.5 or 1.0
    out = qdf.select(
        F.col(id_col),
        F.round(F.try_divide(dot, nrm * F.lit(qn)), 6).alias("cos"),
    )
    if exclude_id is not None:
        out = out.filter(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)


def covariance_matrix(df: DataFrame, vec_col: str, dim: int):
    """Population covariance of a vector column as a dense numpy
    (dim x dim) matrix, plus (n, mean vector).

    The data pass is one ``mapInPandas`` stage that accumulates BLAS
    outer-product partials per Arrow batch — X^T X, column sums, and a
    row count as dim^2 + dim + 1 long-form rows per task — followed by a
    (i, j)-keyed sum.  State and shuffle are O(dim^2) regardless of row
    count (64-dim -> 4161 rows/task), the canonical way to do covariance
    at 100 TB; exploding pairs would push n*dim^2 rows through the
    shuffle instead.  Only the merged O(dim^2) frame reaches the driver
    (the k x dim centroid precedent in ivf.py).

    C = S/n - mean mean^T (covar_pop identity).  Returns (n, mean, C);
    n == 0 yields zero matrices — callers decide the empty semantics.
    """
    import pandas as pd

    def run(batches):
        S = np.zeros((dim, dim))
        m = np.zeros(dim)
        n = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            S += X.T @ X
            m += X.sum(axis=0)
            n += len(X)
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        yield pd.concat([
            pd.DataFrame({"i": ii.ravel(), "j": jj.ravel(), "s": S.ravel()}),
            pd.DataFrame({"i": np.arange(dim), "j": -1, "s": m}),
            pd.DataFrame({"i": [-1], "j": [-1], "s": [float(n)]}),
        ])

    merged = (df.select(vec_col)
              .mapInPandas(run, schema="i INT, j INT, s DOUBLE")
              .groupBy("i", "j").agg(F.sum("s").alias("s"))
              .collect())
    S = np.zeros((dim, dim))
    mean = np.zeros(dim)
    n = 0
    for r in merged:
        if r["i"] == -1:
            n = int(r["s"])
        elif r["j"] == -1:
            mean[r["i"]] = r["s"]
        else:
            S[r["i"], r["j"]] = r["s"]
    if n == 0:
        return 0, mean, S
    mean /= n
    return n, mean, S / n - np.outer(mean, mean)


def power_iteration_top(C, iters: int = 5):
    """Leading eigenpair of a small symmetric matrix by fixed-count
    power iteration from the deterministic all-0.125 start vector
    (no RNG, so every engine/run produces the same digits).  Returns
    (eigenvalue, unit eigenvector); the eigenvalue is ||C v_{k-1}||,
    i.e. the induced norm of the LAST un-normalized iterate — exactly
    what an oracle unrolling the same k matvec+normalize rounds as
    chained CTEs computes."""
    x = np.full(C.shape[0], 0.125)
    nrm = 0.0
    for _ in range(iters):
        y = C @ x
        nrm = float(np.sqrt((y * y).sum()))
        if nrm == 0.0:
            return 0.0, x
        x = y / nrm
    return nrm, x
