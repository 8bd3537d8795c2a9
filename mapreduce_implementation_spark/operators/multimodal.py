"""Multimodal columns (north-star): opaque ``binary`` payloads + typed
metadata, with decode/feature-extraction as Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode step* is
stubbed: ``decode_image_features`` tries PIL and falls back to a
clearly-marked deterministic fake.  Everything around it — the binary
column representation, metadata extraction, the ``mapInPandas`` batch
iterator shape, the output schema — is the real 100 TB plumbing: payload
bytes never leave the executor, Python sees Arrow batches (not rows),
and metadata-only queries never touch the payload column (column
pruning).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["to_binary_payload", "binary_metadata", "decode_image_features", "sample_chunks"]

DECODE_IS_STUBBED: bool
try:  # real decoder if the env ever provides it
    from PIL import Image  # noqa: F401
    DECODE_IS_STUBBED = False
except ImportError:
    DECODE_IS_STUBBED = True


def to_binary_payload(df: DataFrame, src_col: str, media_type: str = "text/plain") -> DataFrame:
    """Model a source column as an opaque media payload: (payload binary,
    media_type, byte_len).  For real corpora the payload arrives as
    parquet/avro binary; here it is derived from text so metadata has a
    DuckDB oracle."""
    return df.withColumn("payload", F.col(src_col).cast("binary")).withColumn(
        "media_type", F.lit(media_type)
    ).withColumn("byte_len", F.octet_length("payload"))


def binary_metadata(df: DataFrame, id_col: str, payload_col: str = "payload") -> DataFrame:
    """Typed metadata without decoding: size, sha256, md5 — all JVM-side."""
    return df.select(
        id_col,
        F.col("media_type"),
        F.octet_length(payload_col).alias("byte_len"),
        F.sha2(F.col(payload_col), 256).alias("sha256_hex"),
        F.md5(F.col(payload_col)).alias("md5_hex"),
    )


_FEAT_SCHEMA = (
    "doc_id BIGINT, width INT, height INT, channels INT, mean_luma DOUBLE, decoder STRING"
)


def decode_image_features(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload") -> DataFrame:
    """Decode payloads to (width, height, channels, mean_luma) features.

    STUB: with no imaging library installed this produces a DETERMINISTIC
    FAKE decode (dimensions/luma derived from payload bytes, decoder
    column = 'stub') — the Spark-side contract (mapInPandas batch
    iterator, Arrow transfer, fixed output schema) is exactly what a real
    decoder drops into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Real decode (PIL Image.open over payload bytes) is not wired
            # yet; use the deterministic stub whether or not an imaging
            # library is importable — the query must not hard-fail merely
            # because the environment gained PIL.
            payloads = pdf[payload_col]
            n = payloads.str.len().fillna(0).astype("int64")
            first = payloads.str[0:1].apply(lambda b: b[0] if len(b) else 0)
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": (16 + (n % 64)).astype("int32"),
                "height": (16 + ((n // 64) % 64)).astype("int32"),
                "channels": pd.Series([3] * len(pdf), dtype="int32"),
                "mean_luma": ((first.astype("float64") + n.astype("float64")) % 256.0).round(2),
                "decoder": ["stub"] * len(pdf),
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema=_FEAT_SCHEMA)


def sample_chunks(df: DataFrame, id_col: str, payload_col: str = "payload",
                  chunk_bytes: int = 64, stride: int = 256) -> DataFrame:
    """Frame/segment sampling plumbing: every ``stride`` bytes emit a
    ``chunk_bytes`` slice with its offset — the shape of video frame
    sampling or audio segmentation, as pure column ops (no Python)."""
    offsets = F.sequence(F.lit(1), F.octet_length(payload_col), F.lit(stride))
    return (
        df.select(id_col, payload_col, F.explode(offsets).alias("offset"))
        .select(
            id_col, "offset",
            F.expr(f"substring({payload_col}, offset, {chunk_bytes})").alias("chunk"),
        )
        .withColumn("chunk_len", F.octet_length("chunk"))
    )
