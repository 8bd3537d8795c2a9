"""IVF (inverted-file) similarity index — the second scale path for ANN
(north star Q12 names both IVF and LSH; operators/similarity.py has the
LSH one).

Build: k-means over the embedding corpus (Lloyd's iterations as
DataFrame jobs — assignment is a JVM-side argmin over centroid literals,
update is one groupBy per iteration; only the k x dim centroid matrix
ever reaches the driver, never rows).  Search: probe the ``nprobe``
nearest centroids' inverted lists, exact re-rank inside them — candidate
set ~ nprobe/k of the corpus.

At 100 TB the build runs on a sample (k-means needs O(sample) per
iteration, not the corpus) and the assignment pass is one full scan;
both are embarrassingly parallel.  Deterministic: seeded init, fixed
iteration count.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectorfn import cosine

__all__ = ["kmeans_fit", "ivf_assign", "ivf_topk"]


def _dist2_expr(vec_col: str, centroid: np.ndarray) -> Column:
    """Squared L2 distance to a centroid literal, JVM-side."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diffs = F.zip_with(F.col(vec_col), c, lambda x, y: (x.cast("double") - y) ** 2)
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _argmin_centroid(vec_col: str, centroids: np.ndarray) -> Column:
    """Index of the nearest centroid (ties -> lowest index).

    Built as a k-element distance array + array_position(array_min) so
    each distance expression appears exactly once in the plan.  (A
    when/otherwise argmin chain nests best-so-far twice per step ->
    exponentially sized expression tree at k=8, dim=64.)
    """
    dists = F.array(*[_dist2_expr(vec_col, c) for c in centroids])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def kmeans_fit(df: DataFrame, vec_col: str, dim: int, k: int = 8,
               iters: int = 5, seed: int = 42) -> np.ndarray:
    """Lloyd's k-means; returns the (k, dim) centroid matrix.

    Init: k seeded gaussian directions scaled to the data's mean norm
    (deterministic, corpus-independent dimensions).  Each iteration:
    one assignment scan + one groupBy(cluster, pos) mean over exploded
    coordinates; empty clusters keep their previous centroid.
    """
    rng = np.random.RandomState(seed)
    mean_norm = df.select(
        F.sqrt(F.aggregate(F.zip_with(F.col(vec_col), F.col(vec_col),
                                      lambda x, y: x.cast("double") * y),
                           F.lit(0.0), lambda a, x: a + x)).alias("n")
    ).agg(F.avg("n")).head()[0]
    if mean_norm is None:  # empty corpus: any seeded centroids do (no
        mean_norm = 1.0    # rows to assign); keeps the bootstrap alive
    centroids = rng.standard_normal((k, dim))
    centroids *= mean_norm / np.linalg.norm(centroids, axis=1, keepdims=True)

    for _ in range(iters):
        assigned = df.withColumn("_c", _argmin_centroid(vec_col, centroids))
        means = (
            assigned.select("_c", F.posexplode(F.col(vec_col)).alias("_p", "_v"))
            .groupBy("_c", "_p").agg(F.avg(F.col("_v").cast("double")).alias("_m"))
            .collect()  # k x dim scalars — model state, not data
        )
        new = centroids.copy()
        for r in means:
            new[r["_c"], r["_p"]] = r["_m"]
        centroids = new
    return centroids


def ivf_assign(df: DataFrame, vec_col: str, centroids: np.ndarray,
               out: str = "cluster") -> DataFrame:
    """Attach the inverted-list id (nearest centroid index)."""
    return df.withColumn(out, _argmin_centroid(vec_col, centroids))


def ivf_topk(df: DataFrame, id_col: str, vec_col: str,
             query_vec: list[float], centroids: np.ndarray,
             k: int = 10, nprobe: int = 3,
             exclude_id: int | None = None) -> DataFrame:
    """Top-k by cosine among the ``nprobe`` nearest inverted lists."""
    qv = np.asarray(query_vec, dtype=np.float64)
    d2 = ((centroids - qv) ** 2).sum(axis=1)
    probe = [int(i) for i in np.argsort(d2)[:nprobe]]
    cand = ivf_assign(df, vec_col, centroids).filter(F.col("cluster").isin(probe))
    if exclude_id is not None:
        cand = cand.filter(F.col(id_col) != exclude_id)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        cand.select(F.col(id_col), F.round(cosine(F.col(vec_col), q), 6).alias("cos"))
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
    )
