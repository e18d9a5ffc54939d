"""Checkpoint recovery: a stopped streaming query restarted from the SAME
checkpoint resumes from the committed offset — already-processed input is
not reprocessed and new input is picked up exactly once. This is the
exactly-once contract a 100 TB ingest pipeline leans on across deploys and
crashes: file-source offsets + aggregation state live in the checkpoint.

The sink is foreachBatch -> parquet (the memory sink deliberately refuses
checkpoint recovery); each emitted row carries its batch_id so the tests
can see exactly which micro-batches ran in which incarnation.
"""

from __future__ import annotations

import os
import tempfile
import time

import pandas as pd
from pyspark.sql import functions as F


def _write_file(dir_: str, name: str, uids: list[int]) -> None:
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(["2024-01-01 10:00:00"] * len(uids)),
            "uid": uids,
            "v": [1] * len(uids),
        }
    )
    pdf.to_parquet(os.path.join(dir_, name), coerce_timestamps="us")


def _start(spark, src, ckpt, out, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = stream.groupBy("uid").agg(F.sum("v").alias("n"))

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out)

    return (
        counts.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


def test_restart_from_checkpoint_is_exactly_once(spark):
    src = tempfile.mkdtemp(prefix="ckpt_src_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_loc_")
    out = os.path.join(tempfile.mkdtemp(prefix="ckpt_out_"), "res")
    _write_file(src, "a.parquet", [1, 2, 3])
    schema = spark.read.parquet(src).schema

    # run 1 drains the initial file and commits its offset + state
    q = _start(spark, src, ckpt, out, schema)
    q.awaitTermination()
    rows1 = spark.read.parquet(out).collect()
    assert {r["uid"]: r["n"] for r in rows1} == {1: 1, 2: 1, 3: 1}
    run1_max_batch = max(r["batch_id"] for r in rows1)

    # new data lands while the query is DOWN
    time.sleep(1.1)
    _write_file(src, "b.parquet", [2, 3, 3])

    # run 2 restarts from the same checkpoint: only b.parquet is processed,
    # and the per-uid aggregation STATE carries over — counts continue
    q = _start(spark, src, ckpt, out, schema)
    q.awaitTermination()
    rows2 = spark.read.parquet(out).collect()
    new = [r for r in rows2 if r["batch_id"] > run1_max_batch]
    # update mode re-emits only uids touched by the new file: uid=1 silent
    assert {r["uid"]: r["n"] for r in new} == {2: 2, 3: 3}, rows2
    # and uid=1's count was not re-emitted or re-counted anywhere
    assert sorted(r["n"] for r in rows2 if r["uid"] == 1) == [1]


def test_restart_with_no_new_data_emits_nothing(spark):
    src = tempfile.mkdtemp(prefix="ckpt_src2_")
    ckpt = tempfile.mkdtemp(prefix="ckpt_loc2_")
    out = os.path.join(tempfile.mkdtemp(prefix="ckpt_out2_"), "res")
    _write_file(src, "a.parquet", [7, 7])
    schema = spark.read.parquet(src).schema

    q = _start(spark, src, ckpt, out, schema)
    q.awaitTermination()
    n_first = spark.read.parquet(out).count()
    assert n_first == 1  # one uid, one update row

    # restart with nothing new: committed offsets mean zero input,
    # so no batch emits rows (reprocessing would re-emit uid=7)
    q = _start(spark, src, ckpt, out, schema)
    q.awaitTermination()
    assert spark.read.parquet(out).count() == n_first
