"""RocksDB state-store provider: the big-state streaming queries must
produce bit-identical results under RocksDB (the provider a production
deployment runs — state on local disk, not executor heap). The full
four-query sweep with state metrics is tools/rocksdb_probe.py; this test
pins the cheapest representative so provider regressions fail in CI."""

from __future__ import annotations

import json
import time

import pytest

from pyspark.sql.streaming import StreamingQueryListener

_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
_KEY = "spark.sql.streaming.stateStore.providerClass"


def test_bitmap_dau_identical_under_rocksdb(spark, sf_dir):
    from big_data_assignment2_2025_spark.plans import QUERIES

    fn = QUERIES["streaming_bitmap_dau"]
    captured: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            captured.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = _L()
    spark.streams.addListener(listener)
    try:
        base = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        captured.clear()
        spark.conf.set(_KEY, _ROCKSDB)
        try:
            rocks = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        finally:
            spark.conf.unset(_KEY)
        assert rocks == base and base
        # the run really went through RocksDB: its custom metrics appear
        time.sleep(2)  # listener delivery is async
        assert any(
            k.startswith("rocksdb")
            for p in captured
            for so in p.get("stateOperators", [])
            for k in so.get("customMetrics", {})
        ), "no rocksdb state-store metrics observed"
    finally:
        spark.streams.removeListener(listener)
