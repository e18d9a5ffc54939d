"""Conf sweep at the ~sf1 probe volume (SURVEY.md §9 item 5): measure how
the two sizing knobs every Spark deployment must set actually behave on
this engine's plans, instead of guessing.

1. ``spark.sql.files.maxPartitionBytes`` sweep — scan-split granularity.
   Too small: task-scheduling overhead dominates; too large: poor
   parallelism + per-task memory pressure. Reports split count and runtime
   of a scan-bound aggregate (q1) per setting.
2. ``spark.sql.autoBroadcastJoinThreshold`` sweep — the shuffle-vs-broadcast
   decision on a dim join (q3's customer join). Reports join strategy
   (from the executed plan) and runtime per setting: -1 forces SMJ both
   sides shuffled; the default lets the planner broadcast the dim; a huge
   threshold must NOT change correctness, only strategy.

Uses the throwaway 10x dataset from tools/scale_probe.py (built if absent).
Usage: python tools/conf_sweep.py      Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_assignment2_2025_spark.session import get_spark
from tools.scale_probe import DST, build


def _time(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    spark = get_spark(app_name="conf_sweep")
    build(spark, 10)

    from big_data_assignment2_2025_spark.plans import QUERIES

    out: dict = {"sf": "10x-probe"}

    # --- maxPartitionBytes sweep on the scan-bound q1 ---
    mpb_rows = []
    # the fixture's 10x tables are ~15 MB/file: sub-16m values actually
    # split files, larger values hit the defaultParallelism floor (the
    # local analogue of "size the knob so splits ≈ a few x cores")
    for mpb in ("1m", "4m", "16m", "128m"):
        spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
        df = QUERIES["q1_pricing_summary"](spark, DST)
        # split count of the raw scan at this granularity
        splits = spark.read.parquet(f"{DST}/lineitem.parquet").rdd.getNumPartitions()
        sec = _time(lambda: df.count())
        mpb_rows.append({"maxPartitionBytes": mpb, "scan_splits": splits, "q1_sec": sec})
        print(f"# mpb={mpb}: splits={splits} q1={sec}s", file=sys.stderr)
    spark.conf.unset("spark.sql.files.maxPartitionBytes")
    out["max_partition_bytes_sweep"] = mpb_rows

    # --- autoBroadcastJoinThreshold sweep on q3's dim join ---
    bt_rows = []
    saved_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for thr in ("-1", "10485760", "104857600"):
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        df = QUERIES["q3_shipping_priority"](spark, DST)
        sec = _time(lambda: df.count())
        plan = df._jdf.queryExecution().executedPlan().toString()
        bt_rows.append(
            {
                "threshold": thr,
                "bhj": plan.count("BroadcastHashJoin"),
                "smj": plan.count("SortMergeJoin"),
                "q3_sec": sec,
            }
        )
        print(f"# thr={thr}: bhj={bt_rows[-1]['bhj']} smj={bt_rows[-1]['smj']} q3={sec}s", file=sys.stderr)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_thr)
    out["broadcast_threshold_sweep"] = bt_rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
