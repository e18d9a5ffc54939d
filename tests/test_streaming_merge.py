"""Streaming upsert: foreachBatch + operators/merge.py — the lakehouse
pattern for continuously merging a CDC/event stream into a target table.
Each micro-batch full-outer-merges into the running target; localCheckpoint
truncates lineage so the plan doesn't grow batch over batch (on a real
lakehouse the merge writes to the table instead)."""

import tempfile
import uuid

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.merge import merge_upsert
from big_data_assignment2_2025_spark.streaming.stream import read_events_stream


def test_streaming_foreachbatch_merge(spark, sf_dir):
    base = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .where(F.col("event_id").isNotNull())
        .select("event_id", "user_id", F.round("value", 4).alias("value"))
    )
    # target starts with a third of the events, values zeroed — the stream
    # must update those and insert the rest
    state = {
        "target": base.where(F.col("event_id") % 3 == 0)
        .withColumn("value", F.lit(0.0))
        .localCheckpoint()
    }

    def upsert_batch(batch_df, batch_id):
        staged = batch_df.select(
            "event_id", "user_id", F.round("value", 4).alias("value")
        )
        state["target"] = (
            merge_upsert(state["target"], staged, on=["event_id"])
            .drop("merge_action")
            .localCheckpoint()
        )

    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "user_id", "value"
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.foreachBatch(upsert_batch)
            .option("checkpointLocation", ckpt)
            .queryName(f"merge_{uuid.uuid4().hex[:8]}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    got = {
        r["event_id"]: (r["user_id"], r["value"])
        for r in state["target"].collect()
    }
    want = {r["event_id"]: (r["user_id"], r["value"]) for r in base.collect()}
    assert got == want  # every zeroed row updated, every missing row inserted
