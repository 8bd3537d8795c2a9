"""Semantic deduplication — SemDeDup-style cluster-then-filter over
embeddings (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication", arXiv:2303.09540).

The 100 TB story: all-pairs cosine over N embeddings is O(N^2) and never
runs at corpus scale.  SemDeDup first PARTITIONS the space (k-means
clusters; here any blocking column) and only compares pairs INSIDE a
block, bounding work to sum(block^2) << N^2.  Within a block, any vector
whose cosine to a LOWER-id block-mate reaches the threshold is dropped;
the min-id greedy is deterministic (the paper keeps the vector closest
to the centroid — id-greedy gives the same dedup rate with a stable,
oracle-checkable survivor set).

Two block sources:
* an existing categorical column (``semantic_dedup_blocked``) — exact,
  SQL-expressible, hash-oracled;
* seeded k-means cluster ids (``semantic_dedup_kmeans``) — the paper's
  shape, reusing :func:`..operators.ivf.kmeans_fit` (only the k x dim
  centroid matrix touches the driver).  Cluster ids depend on the seeded
  fit, so this variant is recall/property-tested rather than oracled.

Both return one row per input vector with a ``kept`` flag rather than
only the survivors, so downstream can either filter (the deduped corpus)
or audit the drop rate per block.

Reference parity: the reference engine has no embedding operators at all
(mapreduce.c:39-566 is tokenize/count/sort); this is part of the
LLM-data-pipeline surface the north star adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["semantic_dedup_blocked", "semantic_dedup_kmeans"]


def semantic_dedup_blocked(df: DataFrame, id_col: str, vec_col: str,
                           block_col: str, min_cosine: float,
                           block_cap: int | None = None) -> DataFrame:
    """(id, block, kept) — drop any vector with a >=threshold neighbor of
    lower id in the SAME block.

    One self-join on the block key (hash shuffle on ``block_col``, never
    all-pairs), one distinct on the dropped side, one left-anti back onto
    the input.  Pair volume is sum over blocks of block^2/2 — the whole
    point of blocking; at real scale the k in k-means is chosen to keep
    blocks ~10k vectors (SemDeDup uses k=50k over 5B embeddings).

    ``block_cap`` is the stop-block guard (same treatment as
    ``lsh_candidate_pairs``'s bucket_cap): a degenerate block with m
    members costs m^2/2 dot products no matter what AQE does, so blocks
    larger than the cap SKIP pairwise dedup entirely — every member kept,
    bounded work, and the miss is explicit in the output rather than a
    job that never finishes.  ``None`` (default, the oracled form)
    disables the guard.
    """
    from ..functions.vectorfn import dot, l2_norm

    if block_cap is not None:
        ok = (df.groupBy(F.col(block_col)).agg(F.count(F.lit(1)).alias("_bn"))
              .filter(F.col("_bn") <= block_cap)
              .select(F.col(block_col).alias("_okblk")))
        joinable = df.join(ok, df[block_col] == ok["_okblk"]).drop("_okblk")
    else:
        joinable = df

    a = joinable.select(F.col(block_col).alias("_blk"),
                  F.col(id_col).alias("_ida"),
                  F.col(vec_col).alias("_va"),
                  l2_norm(F.col(vec_col)).alias("_na"))
    b = joinable.select(F.col(block_col).alias("_blk"),
                        F.col(id_col).alias("_idb"),
                        F.col(vec_col).alias("_vb"),
                        l2_norm(F.col(vec_col)).alias("_nb"))
    # norms folded once per VECTOR pre-join; per pair only the dot runs
    # (bit-identical to cosine() — same expressions, same order)
    # try_divide: a zero-norm vector pairs with nothing (NULL cosine
    # fails the threshold) instead of throwing under ANSI mode
    cos = F.try_divide(dot(F.col("_va"), F.col("_vb")),
                       F.col("_na") * F.col("_nb"))
    dropped = (
        a.join(b, "_blk")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= min_cosine)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return df.select(
        F.col(id_col),
        F.col(block_col).alias("block"),
    ).join(dropped.withColumn("_d", F.lit(1)), id_col, "left").select(
        id_col, "block", F.col("_d").isNull().alias("kept"))


def semantic_dedup_kmeans(df: DataFrame, id_col: str, vec_col: str,
                          dim: int, min_cosine: float, k: int = 8,
                          iters: int = 3, seed: int = 42) -> DataFrame:
    """SemDeDup proper: seeded k-means assigns the blocks, then the same
    within-block min-id greedy.  Output (id, block, kept); ``block`` is
    the cluster index.

    At 100 TB the fit runs on a sample (kmeans_fit already only moves
    k x dim scalars to the driver per iteration) and the assignment is
    one embarrassingly-parallel scan; the dedup join shuffles on the
    cluster id exactly like the blocked variant.
    """
    from .ivf import ivf_assign, kmeans_fit

    centroids = kmeans_fit(df, vec_col, dim=dim, k=k, iters=iters, seed=seed)
    assigned = ivf_assign(df, vec_col, centroids, out="_cluster")
    return semantic_dedup_blocked(assigned, id_col, vec_col,
                                  "_cluster", min_cosine)
