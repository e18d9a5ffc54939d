"""Multi-process OCC on the snapshot store: two genuinely separate
Spark driver processes racing the manifest log (the production shape
the in-process race tests in test_snapshots.py cannot cover). The full
4-phase melee lives in tools/occ_stress.py (artifact OCCSTRESS_r11);
this test runs a small always-on configuration so the cross-process
contract never regresses silently."""

from __future__ import annotations

import os
import subprocess
import sys

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources.snapshots import SnapshotStore

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "tools", "occ_stress.py")


def _spawn(phase: str, store_dir: str, wid: int, n: int):
    return subprocess.Popen(
        [sys.executable, PROBE, "--writer", phase, store_dir, str(wid),
         str(n)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=REPO,
        env=dict(os.environ, SPARK_GRAFT_CPUS="2"),
    )


def test_two_process_append_race_loses_nothing(spark, tmp_path):
    """Two independent driver processes each land 3 appends against one
    store directory: every batch present exactly once, version log
    complete — the os.link publish + bounded rebase holds across real
    process boundaries."""
    st = SnapshotStore(str(tmp_path))
    st.commit(
        spark.createDataFrame([], "row_id long, writer int, batch int"),
        mode="overwrite",
    )
    procs = [_spawn("append", str(tmp_path), w, 3) for w in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-500:]
    df = st.read(spark)
    assert df.count() == 2 * 3 * 100
    assert (
        df.groupBy("writer", "batch").count()
        .where(F.col("count") != 100).count() == 0
    )
    assert st.latest_version() == 1 + 2 * 3


def test_two_process_merge_race_serializes(spark, tmp_path):
    """Two processes MERGE-upsert the same key set concurrently: the
    read-modify-write rebase recomputes against the interleaved state,
    so the final table is ONE writer's batch applied last — never an
    interleaving of the two."""
    base = spark.range(50).select(
        F.col("id").alias("k"), F.lit(-1).alias("writer")
    )
    st = SnapshotStore(str(tmp_path))
    st.commit(base, mode="overwrite", stats_cols=["k"])
    procs = [_spawn("merge_mor", str(tmp_path), w, 1) for w in range(2)]
    for p in procs:
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, out[-500:]
    got = st.read(spark)
    winners = [r["writer"] for r in got.select("writer").distinct().collect()]
    assert got.count() == 50
    assert len(winners) == 1 and winners[0] in (0, 1)
    assert st.latest_version() == 3  # both merges landed, serialized
