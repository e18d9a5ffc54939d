"""Streaming batch-equivalence + multimodal plumbing tests.

Streaming invariant (SURVEY.md §5.5): an availableNow replay of the whole
fixture through a watermarked aggregation must equal the same aggregation
run as a plain batch query — the watermark drops nothing when all data is
on time.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.multimodal import (
    FEAT_DIM,
    decode_features,
    decode_stub,
    frame_sample_plan,
    with_binary_payload,
)
from big_data_assignment2_2025_spark.plans.events_queries import (
    events_hourly_window,
)
from big_data_assignment2_2025_spark.streaming import (
    run_streaming_dedup,
    run_streaming_hourly,
)
from tests.conftest import SF_SMALL


def _rowset(df):
    return {tuple(r) for r in df.collect()}


def test_streaming_hourly_equals_batch(spark):
    got = run_streaming_hourly(spark, SF_SMALL)
    want = events_hourly_window(spark, SF_SMALL)
    assert _rowset(got) == _rowset(want)


def test_streaming_dedup_counts(spark):
    got = {r.event_type: r.n_unique for r in run_streaming_dedup(spark, SF_SMALL).collect()}
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    want = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("event_id").alias("n"))
        .collect()
    }
    assert got == want


def test_decode_stub_deterministic():
    d1, f1 = decode_stub(b"hello world")
    d2, f2 = decode_stub(b"hello world")
    assert (d1, f1) == (d2, f2)
    assert d1 == hashlib.md5(b"hello world").hexdigest()
    assert len(f1) == FEAT_DIM
    assert all(0.0 <= x <= 1.0 for x in f1)


def test_decode_features_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "")], ["doc_id", "text"]
    )
    out = decode_features(with_binary_payload(docs))
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_bytes == 5
    assert rows[1].digest == hashlib.md5(b"alpha").hexdigest()
    assert len(rows[1].features) == FEAT_DIM
    # empty payload still decodes (md5 of b"")
    assert rows[3].digest == hashlib.md5(b"").hexdigest()
    # schema is the declared one (stable for downstream writers)
    assert out.schema.simpleString() == (
        "struct<doc_id:bigint,n_bytes:int,digest:string,features:array<double>>"
    )


def test_decode_features_partitioning(spark):
    """The decode is map-side: repartitioning input changes no output."""
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(20)], ["doc_id", "text"]
    )
    one = decode_features(with_binary_payload(docs).coalesce(1))
    many = decode_features(with_binary_payload(docs).repartition(7))
    assert _rowset(one.select("doc_id", "digest")) == _rowset(
        many.select("doc_id", "digest")
    )


def test_frame_sample_plan(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 640), (2, "y" * 65), (3, "z" * 10)], ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.frame_idx)
        for r in frame_sample_plan(with_binary_payload(docs), every_k=10).collect()
    }
    # doc 1: 10 frames -> idx 0; doc 2: 1 frame -> idx 0; doc 3: 0 frames -> absent
    assert got == {(1, 0), (2, 0)}
