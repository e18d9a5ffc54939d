"""Watermark late-data semantics: an event older than the watermark arriving
in a later micro-batch is dropped from an append-mode windowed aggregation —
the behavior that bounds streaming state at scale.

Two parquet files replayed in mtime order with maxFilesPerTrigger=1:
batch 1 advances the watermark; batch 2 delivers a too-late event.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

import pandas as pd
from pyspark.sql import functions as F


def _write_file(dir_: str, name: str, rows: list[tuple[str, int]]) -> None:
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime([r[0] for r in rows]), "v": [r[1] for r in rows]}
    )
    # µs precision: the shared test session reads ns-timestamps as long
    # (nanosAsLong set by the events reader), which would break withWatermark
    pdf.to_parquet(os.path.join(dir_, name), coerce_timestamps="us")


def test_late_event_dropped_by_watermark(spark):
    src = tempfile.mkdtemp(prefix="wm_src_")
    # batch 0: events up to 12:30 -> post-batch watermark 10:30 (2h delay).
    # NB the watermark lags one trigger: it starts FILTERING in the batch
    # after the one where it advanced, hence the on-time middle batch.
    _write_file(
        src,
        "a.parquet",
        [("2024-01-01 08:15:00", 1), ("2024-01-01 12:30:00", 1)],
    )
    time.sleep(1.1)  # file source orders batches by modification time
    # batch 1: on-time event; wm 10:30 is now active for filtering
    _write_file(src, "b.parquet", [("2024-01-01 13:00:00", 1)])
    time.sleep(1.1)
    # batch 2: an 08:20 event — older than the active watermark -> dropped
    _write_file(src, "c.parquet", [("2024-01-01 08:20:00", 100)])

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        # pandas writes naive (NTZ) timestamps; watermarks need TIMESTAMP
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .select(F.col("w.start").cast("long").alias("h"), "n", "total")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="wm_ckpt_") as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # observability: the drop is visible in the progress metrics — this
        # is the counter a production job alerts on (late-data health)
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for op in p.get("stateOperators", [])
        )
        assert dropped >= 1, [p.get("stateOperators") for p in q.recentProgress]
    emitted = {r.h: (r.n, r.total) for r in spark.table(name).collect()}

    h8 = 1704096000  # 2024-01-01 08:00 UTC
    # the 08:00 window was finalized with ONLY the on-time event; the late
    # v=100 row must not appear
    assert emitted[h8] == (1, 1), emitted
    # batch semantics WOULD have counted it — proving the drop is real
    batch = (
        spark.read.parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .select(F.col("w.start").cast("long").alias("h"), "n", "total")
    )
    batch_h8 = {r.h: (r.n, r.total) for r in batch.collect()}[h8]
    assert batch_h8 == (2, 101)


def test_stream_without_late_data_matches_batch(spark):
    """Control: replaying the same files with no late arrivals, the appended
    windows agree with the batch aggregation."""
    src = tempfile.mkdtemp(prefix="wm_ctl_")
    _write_file(src, "a.parquet", [("2024-01-01 08:15:00", 1), ("2024-01-01 08:40:00", 2)])
    time.sleep(1.1)
    _write_file(src, "b.parquet", [("2024-01-01 12:30:00", 3)])

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
        .select(F.col("w.start").cast("long").alias("h"), "n", "total")
    )
    name = f"wmc_{uuid.uuid4().hex[:8]}"
    with tempfile.TemporaryDirectory(prefix="wm_ckpt_") as ckpt:
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    emitted = {r.h: (r.n, r.total) for r in spark.table(name).collect()}
    # the 08:00 window is final (wm 10:30 passed its end) and matches batch
    assert emitted[1704096000] == (2, 3)
