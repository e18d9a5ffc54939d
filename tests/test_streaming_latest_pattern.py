"""Multi-batch behavior of streaming_latest_state and
streaming_pattern_match — what the single-file availableNow oracle drain
cannot show:

- latest_state: min_by/max_by partials must MERGE across micro-batches
  (the first batch's first_value must survive later batches; a later
  batch's last_value must win), in complete mode.
- pattern_match: a user-day SPLIT across micro-batches must accumulate
  one combined sequence, and the update-log reconciliation
  (max_by on list size) must pick the final cumulative emission, not an
  early partial one.
"""

from __future__ import annotations

import os
import tempfile
import uuid

import pandas as pd

from big_data_assignment2_2025_spark.streaming.stream import (
    latest_state_agg,
    pattern_match_agg,
    pattern_match_finalize,
)


def _write_file(dir_: str, name: str, rows) -> None:
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows]),
            "event_id": pd.array([r[1] for r in rows], dtype="int64"),
            "user_id": pd.array([r[2] for r in rows], dtype="int64"),
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
        }
    )
    pdf.to_parquet(os.path.join(dir_, name), coerce_timestamps="us")


def _stream(spark, src):
    return (
        spark.readStream.schema(
            "ts timestamp, event_id long, user_id long,"
            " event_type string, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _drain(agg, spark, mode):
    name = f"sink_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_latest_state_merges_across_batches(spark):
    src = tempfile.mkdtemp(prefix="lsrc_")
    # batch 1: user 1 clicks value 10.0 at t0 (this must stay first_value)
    _write_file(src, "a.parquet", [("2024-01-01 00:00:00", 1, 1, "click", 10.0)])
    # batch 2: later click value 99.0 (must become last_value), plus
    # an EARLIER-ordinal event arriving late (must take over first_value)
    _write_file(
        src,
        "b.parquet",
        [
            ("2024-01-01 06:00:00", 2, 1, "click", 99.0),
            ("2023-12-31 23:00:00", 0, 1, "click", 5.0),
        ],
    )
    out = _drain(latest_state_agg(_stream(spark, src)), spark, "complete")
    rows = {(r["user_id"], r["event_type"]): r for r in out.collect()}
    r = rows[(1, "click")]
    assert r["n_events"] == 3
    assert r["first_value"] == 5.0  # late-arriving earlier ordinal wins first
    assert r["last_value"] == 99.0
    assert r["last_sec"] == int(pd.Timestamp("2024-01-01 06:00:00").timestamp())


def test_pattern_match_accumulates_across_batches(spark):
    src = tempfile.mkdtemp(prefix="psrc_")
    # one user-day split across three micro-batches, arriving OUT of
    # event order: v (batch1), p (batch2), cc (batch3) -> sorted "vccp"
    _write_file(src, "a.parquet", [("2024-01-01 00:00:01", 1, 7, "view", 1.0)])
    _write_file(src, "b.parquet", [("2024-01-01 00:00:04", 4, 7, "purchase", 1.0)])
    _write_file(
        src,
        "c.parquet",
        [
            ("2024-01-01 00:00:02", 2, 7, "click", 1.0),
            ("2024-01-01 00:00:03", 3, 7, "click", 1.0),
        ],
    )
    rows = _drain(pattern_match_agg(_stream(spark, src)), spark, "update")
    # the update log must contain >1 emission for the key (the multi-batch
    # property under test) ...
    assert rows.where("user_id = 7").count() > 1
    final = pattern_match_finalize(rows).collect()
    assert len(final) == 1
    r = final[0]
    assert (r["user_id"], str(r["day"])) == (7, "2024-01-01")
    assert r["seq_len"] == 4  # v c c p, sorted into event order
    assert r["n_matches"] == 1  # vc+p matches once
