"""Multi-batch state behavior of the chained dropDuplicates -> exact
sliding-distinct aggregation (streaming_rolling_dau, SURVEY §9.9).

Two properties the availableNow single-drain oracle run cannot show:

1. **Multi-batch equivalence** — with the input split across files and
   maxFilesPerTrigger=1, BOTH stateful stages (dedup state and the per-day
   user sets) must carry across micro-batch boundaries; a duplicate
   (day, user) pair arriving in a LATER batch must still be suppressed.
2. **Checkpoint-restart survival** — a second incarnation of the query
   must resume the dedup + set state, not recount from its own input.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F


def _write_file(dir_: str, name: str, rows: list[tuple[str, int]]) -> None:
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows]),
            "user_id": [r[1] for r in rows],
        }
    )
    pdf.to_parquet(os.path.join(dir_, name), coerce_timestamps="us")


def _rolling_dau_stream(spark, src):
    schema = "ts timestamp, user_id long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    daily = (
        stream.select(F.date_trunc("day", "ts").alias("day_ts"), "user_id")
        .withWatermark("day_ts", "7 days")
        .dropDuplicates(["day_ts", "user_id"])
    )
    contrib = daily.select(
        F.explode(
            F.sequence(F.to_date("day_ts"), F.date_add(F.to_date("day_ts"), 6))
        ).alias("win_day"),
        F.to_date("day_ts").alias("day"),
        "user_id",
    )
    return contrib.groupBy("win_day").agg(
        F.size(
            F.collect_set(
                F.when(F.col("day") == F.col("win_day"), F.col("user_id"))
            )
        ).alias("dau1"),
        F.size(F.collect_set("user_id")).alias("dau7"),
    )


def _run_to_completion(spark, src, ckpt, out):
    agg = _rolling_dau_stream(spark, src)

    def sink(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(out)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _result(spark, out):
    return {
        str(r["win_day"]): (r["dau1"], r["dau7"])
        for r in spark.read.parquet(out).where(F.col("dau1") > 0).collect()
    }


def test_dedup_and_set_state_span_micro_batches(spark):
    """user 1 is active on day 1 in THREE separate micro-batches; the
    dedup stage must emit the (day, user) pair exactly once, and the
    distinct sets must merge users from different batches."""
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "src")
        ckpt = os.path.join(root, "ckpt")
        out = os.path.join(root, "out")
        os.makedirs(src)
        _write_file(src, "a.parquet", [("2024-03-01 09:00:00", 1),
                                       ("2024-03-01 10:00:00", 2)])
        _write_file(src, "b.parquet", [("2024-03-01 11:00:00", 1),   # dup pair
                                       ("2024-03-02 09:00:00", 1)])  # new day
        _write_file(src, "c.parquet", [("2024-03-01 12:00:00", 1),   # dup pair
                                       ("2024-03-02 10:00:00", 3)])
        _run_to_completion(spark, src, ckpt, out)
        got = _result(spark, out)
        # day 1: users {1,2}; day 2: users {1,3}; 7-day window over day 2
        # covers both days -> {1,2,3}
        assert got["2024-03-01"] == (2, 2)
        assert got["2024-03-02"] == (2, 3)


def test_rolling_dau_state_survives_checkpoint_restart(spark):
    """Users seen only BEFORE the restart must still count in windows
    extended by post-restart days — set state restored, not rebuilt."""
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "src")
        ckpt = os.path.join(root, "ckpt")
        out = os.path.join(root, "out")
        os.makedirs(src)

        _write_file(src, "a.parquet", [("2024-03-01 09:00:00", 1),
                                       ("2024-03-01 10:00:00", 2)])
        _run_to_completion(spark, src, ckpt, out)
        assert _result(spark, out)["2024-03-01"] == (2, 2)

        # incarnation 2: a different user two days later, plus a duplicate
        # of a PRE-restart pair that the restored dedup state must drop
        _write_file(src, "b.parquet", [("2024-03-03 09:00:00", 3),
                                       ("2024-03-01 23:00:00", 1)])
        _run_to_completion(spark, src, ckpt, out)
        got = _result(spark, out)
        assert got["2024-03-01"] == (2, 2)
        # day 3's window covers day 1's users {1,2} plus the new user 3
        assert got["2024-03-03"] == (1, 3)
