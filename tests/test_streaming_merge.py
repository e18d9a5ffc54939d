"""Streaming upsert: foreachBatch + operators/merge.py — the lakehouse
pattern for continuously merging a CDC/event stream into a target table.
Each micro-batch full-outer-merges into the running target; localCheckpoint
truncates lineage so the plan doesn't grow batch over batch (on a real
lakehouse the merge writes to the table instead)."""

import tempfile
import uuid

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.merge import merge_upsert
from big_data_assignment2_2025_spark.sources.readers import normalize_event_ts
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


def test_foreachbatch_upsert_multibatch(spark, sf_dir, tmp_path):
    """run_streaming_foreachbatch_upsert over a THREE-file stream (three
    micro-batches with maxFilesPerTrigger=1) must converge to the same
    latest-row-per-user table as the batch window query over all events."""
    from pyspark.sql import Window as W

    from big_data_assignment2_2025_spark.streaming.stream import (
        run_streaming_foreachbatch_upsert,
    )

    ev = normalize_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet").where(
            F.col("event_id").isNotNull()
        )
    )
    # three files -> three micro-batches
    src_dir = str(tmp_path / "split_events")
    ev.withColumn("part", (F.col("event_id") % 3).cast("int")).repartition(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(src_dir)

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = normalize_event_ts(
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .where(F.col("event_id").isNotNull())
    )
    got = run_streaming_foreachbatch_upsert(spark, sf_dir, source=stream)

    w = W.partitionBy("user_id").orderBy(
        F.desc("last_ts_us"), F.desc("event_id")
    )
    want = (
        ev.select(
            "user_id",
            "event_id",
            F.unix_micros("ts").alias("last_ts_us"),
            F.col("event_type").alias("last_event_type"),
            F.round(F.col("value") * 100).cast("long").alias("last_value_cents"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "last_ts_us", "last_event_type", "last_value_cents")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
