"""Similarity-search queries (north-star Q12) over ``embeddings``.

The query vector is vec_id=0's embedding — fetched with a 1-row collect
(a query *parameter*, not a data-path collect; in production the caller
supplies it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ann_topk_lsh, cosine_topk
from ..registry import register
from ..sources.tables import load_table

_DIM = 64


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").head()
    return [float(x) for x in row["embedding"]]


@register(
    "similarity_cosine_topk",
    oracle="""
    SELECT b.vec_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a, embeddings b
    WHERE a.vec_id = 0 AND b.vec_id <> 0
    ORDER BY cos DESC, b.vec_id
    LIMIT 10
    """,
    doc="Exact brute-force cosine top-10 to vec 0 (Q12 baseline): one scan, "
        "JVM-side dot products, TakeOrderedAndProject (no global sort).",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, "vec_id", "embedding",
                       _query_vec(spark, sf_dir), k=10, exclude_id=0)


@register(
    "similarity_ann_lsh",
    oracle=None,  # approximate: recall vs exact top-k asserted in tests
    doc="Sign-LSH (8-bit random-hyperplane, Hamming<=1 bucket ring) ANN "
        "top-10 — the 100 TB path: candidate set ~ (1+bits)/2^bits of the "
        "corpus, then exact re-rank.",
)
def q_similarity_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_lsh(emb, "vec_id", "embedding",
                        _query_vec(spark, sf_dir), dim=_DIM, k=10, exclude_id=0)
