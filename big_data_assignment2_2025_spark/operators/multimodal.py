"""Multimodal column plumbing (SURVEY.md §7.6 north-star extension).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schemas, Arrow batch shapes, mapInPandas
signatures, partition behavior — is real and tested; the actual media
*decode* is stubbed deterministically because no image/audio libraries exist
in this container:

- if PIL/librosa were importable we would decode for real (the import-try is
  in ``_try_real_decode``);
- otherwise ``decode_stub`` derives deterministic pseudo-features from the
  payload's md5, so tests and oracles have exact expected values.

Scale design: mapInPandas streams Arrow record batches — constant memory per
task regardless of corpus size; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. The payload column is
projected only where needed (binary bytes never enter a shuffle here — all
derived columns are computed map-side before any aggregation).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: number of fake feature dimensions the stub "extractor" emits
FEAT_DIM = 8

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)


def _try_real_decode():
    """Import a real decoder when available (not in this container)."""
    try:  # pragma: no cover - exercised only where PIL exists
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary payload + typed metadata struct.

    Stand-in for reading real media files: the payload is the UTF-8 encoding
    of the text column (deterministic, reproducible in any engine), and the
    metadata mirrors what an image table would carry.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("fake/utf8").alias("format"),
            F.octet_length(payload).alias("n_bytes"),
            F.lit(1).alias("channels"),
        ),
    )


def decode_stub(payload: bytes) -> tuple[str, list[float]]:
    """Deterministic fake decode: md5 digest + FEAT_DIM features from the
    digest's leading bytes, scaled to [0, 1]. A real build replaces this
    with PIL/librosa decoding — same signature, same output schema."""
    real = _try_real_decode()
    if real is not None:  # pragma: no cover
        raise NotImplementedError(
            "real media decode not wired: container lacks test media"
        )
    digest = hashlib.md5(payload).hexdigest()
    feats = [int(digest[2 * i : 2 * i + 2], 16) / 255.0 for i in range(FEAT_DIM)]
    return digest, feats


def decode_features(df: DataFrame) -> DataFrame:
    """mapInPandas decode + feature-extraction over Arrow batches.

    Input needs columns (doc_id, payload). Output: DECODED_SCHEMA. This is
    the canonical shape for any real decoder: iterate record batches, apply
    a vectorized/per-row decode, yield same-length frames.
    """
    import pandas as pd

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            digests, feats = [], []
            for payload in pdf["payload"]:
                d, f = decode_stub(bytes(payload))
                digests.append(d)
                feats.append(f)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "digest": digests,
                    "features": feats,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(
        decode_batches, schema=DECODED_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_k: int = 10) -> DataFrame:
    """Video-style frame sampling as a *plan* (pure column ops, no decode):
    metadata says how many frames a payload holds; emit (doc_id, frame_idx)
    for every k-th frame. The downstream decode of each sampled frame would
    go through decode_features' mapInPandas path.

    Frames-per-payload is synthesized deterministically as n_bytes/64 — a
    stand-in for container metadata (e.g. mp4 atom parse).
    """
    n_frames = (F.col("media_meta.n_bytes") / F.lit(64)).cast("int")
    return (
        df.select("doc_id", n_frames.alias("n_frames"))
        .where(F.col("n_frames") > 0)
        .select(
            "doc_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
            ).alias("frame_idx"),
        )
    )
