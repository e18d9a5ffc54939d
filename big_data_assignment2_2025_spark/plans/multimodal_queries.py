"""Declared queries for the multimodal plumbing (operators/multimodal.py).

The decode is a deterministic md5-based stub (container has no media libs),
so DuckDB can replay it exactly: payload = UTF-8 bytes of ``text``, digest =
md5(payload) = md5(text), features[i] = byte i of the digest / 255.0.

``multimodal_decode_features`` exercises the REAL scale path — Arrow record
batches through mapInPandas — and its oracle checks every per-document value
including the feature vector (exploded to scalar rows so the value hash
compares doubles, not list reprs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    decode_features,
    frame_sample_plan,
    with_binary_payload,
)
from ..sources.readers import load_table


def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas decode → per-(doc, dim) feature rows."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_features(with_binary_payload(docs))
    return decoded.select(
        "doc_id",
        "n_bytes",
        "digest",
        F.posexplode("features").alias("dim", "feat"),
    )


MULTIMODAL_DECODE_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       md5(text) AS digest,
       CAST(i AS INTEGER) AS dim,
       CAST('0x' || substring(md5(text), 2 * i + 1, 2) AS BIGINT) / 255.0 AS feat
FROM documents CROSS JOIN (SELECT unnest(range(8)) AS i)
"""


def multimodal_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level feature profile: per-dimension mean/min/max over the
    decoded features — the sanity aggregation a real embedding-extraction
    job runs before training."""
    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_features(with_binary_payload(docs))
    return (
        decoded.select(F.posexplode("features").alias("dim", "feat"))
        .groupBy("dim")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("feat"), 6).alias("mean_feat"),
            F.round(F.min("feat"), 6).alias("min_feat"),
            F.round(F.max("feat"), 6).alias("max_feat"),
        )
        .orderBy("dim")
    )


MULTIMODAL_STATS_SQL = """
WITH f AS (
  SELECT CAST(i AS INTEGER) AS dim,
         CAST('0x' || substring(md5(text), 2 * i + 1, 2) AS BIGINT) / 255.0 AS feat
  FROM documents CROSS JOIN (SELECT unnest(range(8)) AS i)
)
SELECT dim, COUNT(*) AS n,
       round(AVG(feat), 6) AS mean_feat,
       round(MIN(feat), 6) AS min_feat,
       round(MAX(feat), 6) AS max_feat
FROM f GROUP BY dim ORDER BY dim
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling plan from payload metadata (no decode)."""
    docs = load_table(spark, sf_dir, "documents")
    return frame_sample_plan(with_binary_payload(docs), every_k=10)


MULTIMODAL_FRAMES_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST(octet_length(encode(text)) // 64 AS INTEGER) AS n_frames
  FROM documents)
SELECT doc_id, n_frames, CAST(f AS INTEGER) AS frame_idx
FROM m CROSS JOIN LATERAL (SELECT unnest(range(0, n_frames, 10)) AS f)
WHERE n_frames > 0
"""


def pandas_udf_quantile_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF (Arrow-batched scalar) demonstration — the
    sanctioned slow path when column expressions genuinely can't express the
    logic. Here: a per-batch vectorized value->bucket transform over events,
    aggregated per (event_type, bucket). Chosen to be SQL-replayable so the
    UDF *plumbing* is what's under test, per the zero-hot-path-UDF policy
    (SURVEY.md §2.9)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # NB: no type hints — `from __future__ import annotations` stringifies
    # them and pandas_udf rejects string signatures; returnType covers it
    def _bucket(v):
        return (v // 50).clip(upper=5).astype("int32")

    value_bucket = pandas_udf(_bucket, "int")
    assert pd is not None  # imported for the executor-side closure

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type", value_bucket("value").alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("event_type", "bucket")
    )


PANDAS_UDF_SQL = """
SELECT event_type,
       CAST(LEAST(floor(value / 50), 5) AS INTEGER) AS bucket,
       COUNT(*) AS n
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def multimodal_chunk_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob sharding: split each payload into fixed 256-byte chunks with a
    per-chunk digest — the step that turns oversized media blobs into
    storable/parallelizable units (object-store part uploads, per-chunk
    dedup). Pure projection + explode: no shuffle, scales linearly; chunk
    count derives from length, so the plan never materializes the blob
    twice. Corpus is ASCII (FIXTURES.md) so char offsets == byte offsets
    and DuckDB replays the chunking exactly."""
    docs = load_table(spark, sf_dir, "documents").where(F.length("text") > 0)
    chunked = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("text") - 1) / 256).cast("int"),
            )
        ).alias("chunk_idx"),
    )
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.length(F.expr("substring(text, chunk_idx * 256 + 1, 256)")).alias(
            "chunk_len"
        ),
        F.md5(F.expr("substring(text, chunk_idx * 256 + 1, 256)")).alias(
            "chunk_md5"
        ),
    )


MULTIMODAL_CHUNK_SQL = """
SELECT doc_id,
       CAST(i AS INTEGER) AS chunk_idx,
       CAST(length(substring(text, CAST(i AS INTEGER) * 256 + 1, 256)) AS INTEGER)
         AS chunk_len,
       md5(substring(text, CAST(i AS INTEGER) * 256 + 1, 256)) AS chunk_md5
FROM documents
CROSS JOIN LATERAL (
  SELECT unnest(range((length(text) - 1) // 256 + 1)) AS i)
WHERE length(text) > 0
"""


QUERIES = {
    "multimodal_chunk_payloads": multimodal_chunk_payloads,
    "pandas_udf_quantile_bucket": pandas_udf_quantile_bucket,
    "multimodal_decode_features": multimodal_decode_features,
    "multimodal_feature_stats": multimodal_feature_stats,
    "multimodal_frame_sample": multimodal_frame_sample,
}

ORACLES = {
    "multimodal_chunk_payloads": MULTIMODAL_CHUNK_SQL,
    "pandas_udf_quantile_bucket": PANDAS_UDF_SQL,
    "multimodal_decode_features": MULTIMODAL_DECODE_SQL,
    "multimodal_feature_stats": MULTIMODAL_STATS_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAMES_SQL,
}
