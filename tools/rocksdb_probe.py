"""RocksDB state-store probe: run the big-state streaming queries under
BOTH state store providers (default HDFSBackedStateStoreProvider and
RocksDBStateStoreProvider), assert identical results, and record the
per-query state-store metrics (numRowsTotal, memory) from the streaming
progress events.

Why: the engine's "bounded streaming state" claims (rolling-DAU exact +
HLL twins, CMS counters, bitmap words — SCALING.md §13) were measured
under the default in-memory provider only. RocksDB is the provider a
100 TB deployment actually runs (state spills to local SSD instead of
executor heap), so the bounded-state numbers need a second witness: the
SAME numRowsTotal under both providers, RocksDB's own memory metrics in
evidence, and bit-identical query results.

Capture: progress events arrive on a listener thread; each query fn
drains its streams internally (availableNow), so the probe snapshots the
listener's accumulated stateOperators AFTER the fn returns (with a short
settle wait — listener delivery is async).

Usage: python tools/rocksdb_probe.py [sf_dir]     (default sf0.1)
Prints one JSON line; the round artifact is committed as
ROCKSDB_r{N}.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.streaming import StreamingQueryListener

from big_data_assignment2_2025_spark.session import get_spark

SRC = "/root/testdata/sf0.1"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

#: the large-state streaming shapes named by the r9 verdict, plus the HLL
#: rolling-DAU twin whose boundedness is the headline sketch claim
PROBES = [
    "streaming_rolling_dau",
    "streaming_rolling_dau_hll",
    "streaming_user_freq_cms",
    "streaming_bitmap_dau",
]


class _ProgressCapture(StreamingQueryListener):
    """Keeps the LAST progress per runId (the final micro-batch carries the
    end-state numRowsTotal for availableNow queries)."""

    def __init__(self) -> None:
        self.by_run: dict[str, dict] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        self.by_run[p["runId"]] = p

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def snapshot_and_clear(self) -> list[dict]:
        time.sleep(2.0)  # listener delivery is async; let the tail land
        out = list(self.by_run.values())
        self.by_run.clear()
        return out


def _state_metrics(progresses: list[dict]) -> dict:
    """Aggregate stateOperators across every streaming query the fn ran:
    total state rows, the provider's heap figure (memoryUsedBytes — both
    providers report it), and RocksDB's own evidence: summed SST file
    bytes (the state that lives on local disk instead of executor heap —
    the point of the provider at 100 TB) plus pinned block memory. Any
    ``rocksdb*`` custom-metric key doubles as proof the provider actually
    served the run (``provider_confirmed``)."""
    rows_total = mem = sst = pinned = 0
    n_ops = 0
    rocks_seen = False
    for p in progresses:
        for so in p.get("stateOperators", []):
            n_ops += 1
            rows_total += so.get("numRowsTotal", 0)
            mem += so.get("memoryUsedBytes", 0)
            cm = so.get("customMetrics", {})
            if any(k.startswith("rocksdb") for k in cm):
                rocks_seen = True
            sst += int(cm.get("rocksdbSstFileSize", 0))
            pinned += int(cm.get("rocksdbPinnedBlocksMemoryUsage", 0))
    return {
        "state_operators": n_ops,
        "num_rows_total": rows_total,
        "memory_used_bytes": mem,
        "rocksdb_sst_file_bytes": sst,
        "rocksdb_pinned_mem_bytes": pinned,
        "provider_confirmed": rocks_seen,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SRC
    spark = get_spark(app_name="rocksdb_probe")
    cap = _ProgressCapture()
    spark.streams.addListener(cap)

    from big_data_assignment2_2025_spark.plans import QUERIES

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    out: dict[str, dict] = {}
    failures: list[str] = []
    for name in PROBES:
        fn = QUERIES[name]
        row: dict[str, dict] = {}
        results: dict[str, list] = {}
        for label, provider in (("hdfs", None), ("rocksdb", ROCKSDB)):
            if provider is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, provider)
            cap.snapshot_and_clear()  # drop any stragglers from before
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = sorted(tuple(r) for r in df.collect())
            sec = round(time.perf_counter() - t0, 2)
            metrics = _state_metrics(cap.snapshot_and_clear())
            metrics["sec"] = sec
            metrics["result_rows"] = len(rows)
            row[label] = metrics
            results[label] = rows
        spark.conf.unset(conf_key)
        same = results["hdfs"] == results["rocksdb"]
        row["results_identical"] = same
        row["state_rows_identical"] = (
            row["hdfs"]["num_rows_total"] == row["rocksdb"]["num_rows_total"]
        )
        # each leg must have been served by the provider it claims:
        # rocksdb metrics present under RocksDB, absent under HDFS
        ok_provider = (
            row["rocksdb"]["provider_confirmed"]
            and not row["hdfs"]["provider_confirmed"]
        )
        row["provider_switch_confirmed"] = ok_provider
        if not same or not ok_provider:
            failures.append(name)
        out[name] = row
        print(
            f"# {name}: identical={same} provider_ok={ok_provider} "
            f"state_rows hdfs={row['hdfs']['num_rows_total']} "
            f"rocksdb={row['rocksdb']['num_rows_total']} "
            f"sst={row['rocksdb']['rocksdb_sst_file_bytes']}B "
            f"heap hdfs={row['hdfs']['memory_used_bytes']}B "
            f"rocksdb={row['rocksdb']['memory_used_bytes']}B",
            file=sys.stderr,
        )

    print(json.dumps({"sf_dir": sf_dir, "queries": out,
                      "failures": failures}))
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
