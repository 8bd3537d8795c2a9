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

    Per-payload decoder selection, recorded in the ``decoder`` column:
    'pil' when PIL is importable on the executor AND the bytes decode as
    an image; otherwise a DETERMINISTIC FAKE ('stub': dimensions/luma
    derived from payload bytes).  In this container (no imaging library)
    every row is 'stub'; the moment an env has PIL, real image payloads
    decode for real with no code change.  The Spark-side contract
    (mapInPandas batch iterator, Arrow transfer, fixed output schema) is
    identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # PIL is probed per-call (inside the executor), not at module
        # import: the env that submits the job and the env that runs the
        # task can differ, and the query must work in both.
        try:
            import io as _io

            from PIL import Image as _Image
        except ImportError:
            _Image = None

        def _stub_row(payload: bytes | None) -> tuple[int, int, int, float, str]:
            b = payload or b""
            n = len(b)
            first = b[0] if n else 0
            return (16 + (n % 64), 16 + ((n // 64) % 64), 3,
                    round(float((first + n) % 256.0), 2), "stub")

        def _decode_row(payload: bytes | None) -> tuple[int, int, int, float, str]:
            # Real decode when PIL is present AND the bytes are an image;
            # per-payload fallback to the deterministic stub otherwise
            # (a corrupt/non-image payload must not fail the task).
            if _Image is not None and payload:
                try:
                    with _Image.open(_io.BytesIO(payload)) as im:
                        gray = im.convert("L")
                        import numpy as _np
                        luma = float(_np.asarray(gray, dtype=_np.float64).mean())
                        return (im.width, im.height, len(im.getbands()),
                                round(luma, 2), "pil")
                except Exception:
                    pass
            return _stub_row(payload)

        for pdf in batches:
            feats = [_decode_row(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": pd.Series([f[0] for f in feats], dtype="int32"),
                "height": pd.Series([f[1] for f in feats], dtype="int32"),
                "channels": pd.Series([f[2] for f in feats], dtype="int32"),
                "mean_luma": [f[3] for f in feats],
                "decoder": [f[4] for f in feats],
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


def batch_inference_scores(df, id_col: str, text_col: str,
                           batch_label: str = "stub-scorer-v1"):
    """Batched model-inference plumbing over ``mapInPandas`` — the shape
    of running a scorer/reranker/classifier model over a corpus: Arrow
    batches stream through a Python worker that would hold the model in
    memory per task (load once per iterator, score per batch), never a
    per-row UDF call.

    The "model" here is a deterministic stub (first 8 hex digits of
    md5(text) scaled to [0,1)) because no inference runtime ships in
    this container — the REAL content is the iterator pattern, the
    fixed output schema, and Arrow transport, which is exactly what a
    torch/onnx scorer drops into.  Deterministic stub => the whole
    pipeline stays hash-oracled (DuckDB computes the same md5 math).
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    schema = f"{id_col} long, score double, scored_by string"

    def _score(batches):
        # model load would happen HERE, once per task/iterator
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(columns=[id_col, "score", "scored_by"])
                continue
            import hashlib

            # null text -> null score (str(None) would fabricate a
            # score for md5("None") and diverge from the oracle's
            # md5(NULL) = NULL)
            s = pdf[text_col].map(
                lambda t: None if t is None else round(
                    int(hashlib.md5(str(t).encode()).hexdigest()[:8], 16)
                    / float(16 ** 8), 6))
            yield pd.DataFrame({id_col: pdf[id_col],
                                "score": s,
                                "scored_by": batch_label})

    return df.select(id_col, text_col).mapInPandas(_score, schema=schema)
