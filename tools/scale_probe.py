"""Scale probe: run flagship plans at ~sf1 (10x the largest shipped fixture)
to exercise the behaviors the small fixtures cannot — multi-file scans, AQE
partition coalescing on real volumes, broadcast-threshold sanity, shuffle
sizes (SURVEY.md §9's "needs the next SF up" item).

The probe derives a LOCAL THROWAWAY dataset under /tmp from sf0.1 (read-only
testdata is never touched): fact tables (lineitem, orders, events,
documents) are unioned 10x with key shifts that preserve join integrity
(order keys shift identically in lineitem and orders; dimension keys are
left alone — dims grow slower than facts in any real warehouse, and keeping
them fixed preserves the broadcast-side sizes). Written as multiple parquet
files so scans split properly.

Usage: python tools/scale_probe.py [copies]     (default 10)
Prints one JSON line with per-query timings and plan checks.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf_probe"

#: key shift per copy — far above any real key range in the fixtures
SHIFT = 10**9

PROBES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "index_term_freq",
    "bm25_search",
    "dedup_exact",
    "events_sessionize",
    "window_topk_per_group",
]


def _scale(df, copies: int, shifts: dict[str, bool]):
    parts = []
    for i in range(copies):
        c = df
        for col, do in shifts.items():
            if do:
                c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
        parts.append(c)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def build(spark, copies: int) -> None:
    if os.path.exists(os.path.join(DST, "_DONE")):
        return
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    plans = {
        "lineitem": {"l_orderkey": True},
        "orders": {"o_orderkey": True},
        "events": {"event_id": True},
        "documents": {"doc_id": True},
    }
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        if t in plans:
            scaled = _scale(src, copies, plans[t])
            # several files per table => a properly split scan downstream
            scaled.repartition(16).write.mode("overwrite").parquet(
                f"{DST}/{t}.parquet"
            )
        else:
            src.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_DONE"), "w").write("ok")


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark(app_name="scale_probe")
    t0 = time.perf_counter()
    build(spark, copies)
    build_s = round(time.perf_counter() - t0, 1)

    from big_data_assignment2_2025_spark.plans import QUERIES

    timings, checks = {}, {}
    for name in PROBES:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            df = fn(spark, DST)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        checks[name] = {
            "rows": n,
            "bhj": plan.count("BroadcastHashJoin"),
            "smj": plan.count("SortMergeJoin"),
            "cartesian": "CartesianProduct" in plan,
        }
        print(f"# {name}: {timings[name]}s rows={n} {checks[name]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "copies": copies,
                "build_sec": build_s,
                "timings": timings,
                "checks": checks,
                "total_sec": round(sum(timings.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
