"""Multi-batch state behavior of the sliding-window exact rolling-DAU
streams (streaming_rolling_dau, SURVEY §9.9).

Four properties the availableNow single-drain oracle run cannot show:

1. **Multi-batch set merge** — with the input split across files and
   maxFilesPerTrigger=1, the per-window user sets must merge users from
   different micro-batches, and a duplicate (day, user) observation in a
   LATER batch must not inflate any count (collect_set idempotence is
   what lets the query run as ONE stateful op, no dedup stage).
2. **Checkpoint-restart survival** — a second incarnation of the query
   must resume the window-set state, not recount from its own input.
3. **State EVICTION** — the r6 verdict's finding: grouping on a native
   event-time window under the watermark must let the state store DROP
   closed windows as the watermark advances; state is bounded by open
   windows, not stream history. Asserted via stateOperators metrics.
4. **NULL-user observedness** — a day whose rows all carry NULL user_id
   is still an observed day (dau1 = 0), because observedness comes from
   the 1-day window row EXISTING, not from dau1 > 0 (r6 ADVICE nit).
"""

from __future__ import annotations

import json
import os
import tempfile

import pandas as pd

from big_data_assignment2_2025_spark.streaming.stream import (
    reconcile_dau_updates,
    rolling_dau_streams,
)


def _write_file(dir_: str, name: str, rows: list[tuple[str, int | None]]) -> None:
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime([r[0] for r in rows]),
            "user_id": pd.array([r[1] for r in rows], dtype="Int64"),
        }
    )
    pdf.to_parquet(os.path.join(dir_, name), coerce_timestamps="us")


def _streams(spark, src):
    stream = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return rolling_dau_streams(spark, stream)


def _drain(agg, ckpt, out):
    """availableNow update-mode drain appending emissions to parquet;
    returns the finished query (for state metrics)."""

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def _run_both(spark, src, root):
    qs = {}
    for key, agg in zip(("dau7", "dau1"), _streams(spark, src)):
        qs[key] = _drain(
            agg, os.path.join(root, f"ckpt_{key}"), os.path.join(root, f"out_{key}")
        )
    result = reconcile_dau_updates(
        spark.read.parquet(os.path.join(root, "out_dau1")),
        spark.read.parquet(os.path.join(root, "out_dau7")),
    )
    return {str(r["day"]): (r["dau1"], r["dau7"]) for r in result.collect()}, qs


def _final_state_rows(q) -> int:
    """numRowsTotal of the aggregation state store at the LAST progress
    that reported state metrics."""
    rows = []
    for p in q.recentProgress:
        d = json.loads(p.json) if hasattr(p, "json") else p
        if d.get("stateOperators"):
            rows.append(d["stateOperators"][0]["numRowsTotal"])
    assert rows, "no stateOperators progress recorded"
    return rows[-1]


def test_set_state_merges_across_micro_batches(spark):
    """user 1 is active on day 1 in THREE separate micro-batches; the
    window sets must merge users from different batches and stay
    duplicate-proof without a dedup stage."""
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "src")
        os.makedirs(src)
        _write_file(src, "a.parquet", [("2024-03-01 09:00:00", 1),
                                       ("2024-03-01 10:00:00", 2)])
        _write_file(src, "b.parquet", [("2024-03-01 11:00:00", 1),   # dup pair
                                       ("2024-03-02 09:00:00", 1)])  # new day
        _write_file(src, "c.parquet", [("2024-03-01 12:00:00", 1),   # dup pair
                                       ("2024-03-02 10:00:00", 3)])
        got, _ = _run_both(spark, src, root)
        # day 1: users {1,2}; day 2: users {1,3}; 7-day window over day 2
        # covers both days -> {1,2,3}; phantom trailing windows trimmed
        assert got == {"2024-03-01": (2, 2), "2024-03-02": (2, 3)}


def test_rolling_dau_state_survives_checkpoint_restart(spark):
    """Users seen only BEFORE the restart must still count in windows
    extended by post-restart days — window-set state restored, not
    rebuilt from incarnation 2's own input."""
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "src")
        os.makedirs(src)
        _write_file(src, "a.parquet", [("2024-03-01 09:00:00", 1),
                                       ("2024-03-01 10:00:00", 2)])
        got, _ = _run_both(spark, src, root)
        assert got == {"2024-03-01": (2, 2)}

        # incarnation 2: a new user two days later, plus a duplicate of a
        # PRE-restart (day, user) observation the restored sets must absorb
        _write_file(src, "b.parquet", [("2024-03-03 09:00:00", 3),
                                       ("2024-03-01 23:00:00", 1)])
        got, _ = _run_both(spark, src, root)
        assert got["2024-03-01"] == (2, 2)
        # day 3's window covers day 1's users {1,2} plus the new user 3 —
        # 3 is only reachable if the restored state kept {1,2}
        assert got["2024-03-03"] == (1, 3)


def test_closed_windows_are_evicted_from_state(spark):
    """The r6 verdict fix: a >14-day time gap must shrink the sliding-agg
    state store (closed windows dropped once the watermark passes their
    end) while the evicted windows' results stay correct."""
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "src")
        os.makedirs(src)
        # 8 open windows after batch a (end-days 03-01..03-08)
        _write_file(src, "a.parquet", [("2024-03-01 09:00:00", 1),
                                       ("2024-03-01 10:00:00", 2),
                                       ("2024-03-02 09:00:00", 1)])
        # batch b jumps 18 days; batch c advances the watermark past every
        # March-1/2 window end (03-20 - 7d = 03-13), forcing eviction
        _write_file(src, "b.parquet", [("2024-03-20 09:00:00", 3)])
        _write_file(src, "c.parquet", [("2024-03-21 09:00:00", 4)])
        got, qs = _run_both(spark, src, root)
        # evicted windows' emitted values are final and correct
        assert got["2024-03-01"] == (2, 2)
        assert got["2024-03-02"] == (1, 2)
        assert got["2024-03-20"] == (1, 1)
        assert got["2024-03-21"] == (1, 2)
        # 16 distinct windows existed over the run (8 + 7 + 1 new); with
        # eviction, at most the 8 windows still covering 03-20/03-21
        # (end-days 03-20..03-27) remain in state
        state_rows = _final_state_rows(qs["dau7"])
        assert state_rows <= 8, f"state not evicted: {state_rows} windows live"


def test_all_null_user_day_is_still_observed(spark):
    """A day whose only rows have NULL user_id is an observed day with
    dau1 = 0 (row existence, not dau1 > 0, drives observedness)."""
    with tempfile.TemporaryDirectory() as root:
        src = os.path.join(root, "src")
        os.makedirs(src)
        _write_file(src, "a.parquet", [("2024-03-01 09:00:00", 1),
                                       ("2024-03-01 10:00:00", 2),
                                       ("2024-03-02 09:00:00", None)])
        got, _ = _run_both(spark, src, root)
        assert got == {"2024-03-01": (2, 2), "2024-03-02": (0, 2)}


def test_state_partitions_scoped_override_restores(spark):
    """The drain-time partition override must restore the session value on
    both the success and failure paths — a leaked override would silently
    re-plan every subsequent BATCH query at the streaming drain size."""
    from big_data_assignment2_2025_spark.streaming.stream import (
        STREAM_STATE_PARTITIONS,
        _state_partitions,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    with _state_partitions(spark):
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(
            STREAM_STATE_PARTITIONS
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    try:
        with _state_partitions(spark, 3):
            assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
