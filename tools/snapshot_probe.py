"""Snapshot-store scale probe: measure the four claims the store's
docstrings make, instead of asserting them.

 1. **Time travel is O(that version)**: reading v1 after N later appends
    opens exactly v1's files — wall time and files-opened flat in N.
 2. **Latest-read is O(members)**: files opened grows with commit count
    (the motivation for compaction), and one compact() collapses it.
 3. **diff is O(new data)**: files opened for diff(N-1, N) is constant.
 4. **Metadata stays metadata**: manifest bytes grow linearly in commit
    count at ~100 B/commit (stats included) — KBs where the data is GBs;
    the checkpoint move real formats make is only needed at ~10^4
    commits.
 5. **Pruned MERGE is O(affected files + changes)**: the same one-member
    change batch merged with prune=True vs prune=False — the pruned form
    rewrites 1 of N members and never reads the rest, the logical form
    full-outer-joins the whole table.

Writes SNAPSHOT_r{N}.json. Usage: python tools/snapshot_probe.py [round]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.session import get_spark
from big_data_assignment2_2025_spark.sources.snapshots import SnapshotStore

ROWS_PER_COMMIT = 200_000
N_APPENDS = 24


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "x"
    spark = get_spark(app_name="snapshot_probe")
    base = os.path.join(tempfile.gettempdir(), "snapprobe")
    if os.path.exists(base):
        shutil.rmtree(base)
    store = SnapshotStore(base)

    def batch(k: int):
        lo = k * ROWS_PER_COMMIT
        return (
            spark.range(lo, lo + ROWS_PER_COMMIT, 1, 4)
            .withColumnRenamed("id", "k")
        )

    t0 = time.time()
    for k in range(N_APPENDS):
        store.commit(
            batch(k),
            mode="append" if k else "overwrite",
            stats_cols=["k"],
        )
    build_sec = round(time.time() - t0, 2)

    def timed_count(df):
        t = time.time()
        n = df.count()
        return n, round(time.time() - t, 3), len(df.inputFiles())

    out: dict = {
        "rows_per_commit": ROWS_PER_COMMIT,
        "n_appends": N_APPENDS,
        "build_sec": build_sec,
    }

    # 1. time travel flat in later history: v1 read opens only v1's files
    n, sec, files = timed_count(store.read(spark, 1))
    out["read_v1_after_appends"] = {"rows": n, "sec": sec, "files": files}
    assert n == ROWS_PER_COMMIT

    # 2. latest read opens every member; compaction collapses it
    n, sec, files = timed_count(store.read(spark))
    out["read_latest"] = {"rows": n, "sec": sec, "files": files}
    vc = store.compact(spark, target_files=4)
    n, sec, files_c = timed_count(store.read(spark, vc))
    out["read_compacted"] = {"rows": n, "sec": sec, "files": files_c}
    assert files_c < files and n == ROWS_PER_COMMIT * N_APPENDS

    # 3. diff of the newest append is O(new data)
    n, sec, files = timed_count(store.diff(spark, N_APPENDS - 1, N_APPENDS))
    out["diff_last_append"] = {"rows": n, "sec": sec, "files": files}
    assert n == ROWS_PER_COMMIT

    # 3b. pruned read of one commit's key range opens ~1/N of the files
    lo = (N_APPENDS // 2) * ROWS_PER_COMMIT
    pruned = store.read_where(
        spark, "k", lo, lo + ROWS_PER_COMMIT, version=N_APPENDS
    )
    n, sec, files = timed_count(pruned)
    full_files = out["read_latest"]["files"]
    out["pruned_read_one_range"] = {
        "rows": n,
        "sec": sec,
        "files": files,
        "files_full_scan": full_files,
        "skip_ratio": round(1 - files / full_files, 3),
    }
    assert n == ROWS_PER_COMMIT

    # 5. pruned vs logical MERGE of a one-member change batch, run on two
    # fresh equal stores (the main store was compacted above, which
    # deliberately drops the range clustering pruning needs)
    merge_out = {}
    for label, prune in (("logical", False), ("pruned", True)):
        mbase = os.path.join(tempfile.gettempdir(), f"snapprobe_m_{label}")
        if os.path.exists(mbase):
            shutil.rmtree(mbase)
        ms = SnapshotStore(mbase)
        for k in range(N_APPENDS):
            ms.commit(
                batch(k),
                mode="append" if k else "overwrite",
                stats_cols=["k"],
            )
        lo = (N_APPENDS // 2) * ROWS_PER_COMMIT
        changes = (
            batch(N_APPENDS // 2)
            .where(F.col("k") < lo + 1000)
            .select(
                "k",
                F.when(F.col("k") % 2 == 0, F.lit("upsert"))
                .otherwise(F.lit("delete"))
                .alias("_op"),
            )
        )
        n_members_before = len(ms.manifest(ms.latest_version())["members"])
        t = time.time()
        v = ms.merge(spark, changes, keys=["k"], prune=prune)
        sec = round(time.time() - t, 3)
        doc = ms.manifest(v)
        merge_out[label] = {
            "sec": sec,
            "mode": doc["mode"],
            "n_members_after": len(doc["members"]),
            # logical merges carry no "rewrote" field — they read and
            # rewrite every pre-merge member
            "rewrote": len(doc["rewrote"]) if "rewrote" in doc
            else n_members_before,
            "rows_after": ms.read(spark, v).count(),
        }
        shutil.rmtree(mbase)
    assert merge_out["pruned"]["rewrote"] == 1
    assert (
        merge_out["pruned"]["rows_after"]
        == merge_out["logical"]["rows_after"]
    )
    out["merge_one_member_batch"] = merge_out

    # 6. partition-spec point read (round 10): a dimension that is NOT
    # range-clustered (cat = k % 8 — every append contains every value)
    # defeats [min,max] stats entirely; an identity partition spec on it
    # prunes the point read to 1/|domain| of the members. This is the
    # claim "partition layout prunes what stats cannot", measured.
    pbase = os.path.join(tempfile.gettempdir(), "snapprobe_pspec")
    if os.path.exists(pbase):
        shutil.rmtree(pbase)
    ps = SnapshotStore(pbase)
    n_pappends = 12

    def cat_batch(k: int):
        return batch(k).withColumn("cat", (F.col("k") % 8).cast("int"))

    ps.commit(cat_batch(0).limit(0), mode="overwrite")  # schema-bearing v1
    ps.set_partition_spec([("cat", "identity")])
    for k in range(n_pappends):
        ps.commit(cat_batch(k), mode="append", stats_cols=["k"])
    doc = ps.manifest(ps.latest_version())
    planned = ps.planned_members_point(spark, "cat", 3)
    t = time.time()
    point = ps.read_point(spark, "cat", 3)
    n, sec, files = timed_count(point)
    # the stats-only twin: same batches, no spec — every member overlaps
    # cat=3, nothing prunes
    ubase = os.path.join(tempfile.gettempdir(), "snapprobe_unpart")
    if os.path.exists(ubase):
        shutil.rmtree(ubase)
    us = SnapshotStore(ubase)
    for k in range(n_pappends):
        us.commit(
            cat_batch(k), mode="append" if k else "overwrite",
            stats_cols=["k"],
        )
    n_u, sec_u, files_u = timed_count(
        us.read(spark).where(F.col("cat") == 3)
    )
    assert n == n_u == n_pappends * ROWS_PER_COMMIT // 8

    def _dir_bytes(store_obj, members):
        total = 0
        for m in members:
            full = os.path.join(store_obj.base_dir, m)
            for f in os.listdir(full):
                total += os.path.getsize(os.path.join(full, f))
        return total

    udoc = us.manifest(us.latest_version())
    out["partition_spec_point_read"] = {
        "members_total": len(doc["members"]),
        "members_planned": len(planned),
        "member_skip_ratio": round(1 - len(planned) / len(doc["members"]), 3),
        # bytes are the honest metric: the spec'd members are 1/|domain|
        # the size, so file COUNTS barely move while scanned bytes drop
        # ~8x — exactly the partition-pruning win
        "bytes_spec": _dir_bytes(ps, planned),
        "bytes_unpartitioned_twin": _dir_bytes(us, udoc["members"]),
        "sec_spec": sec,
        "sec_unpartitioned_twin": sec_u,
        "rows": n,
    }
    shutil.rmtree(pbase)
    shutil.rmtree(ubase)

    # 4. manifest growth: bytes per version
    sizes = {
        v: os.path.getsize(store._manifest_path(v))
        for v in (1, N_APPENDS // 2, N_APPENDS)
    }
    out["manifest_bytes"] = {str(v): s for v, s in sizes.items()}
    out["manifest_bytes_per_commit"] = round(
        sizes[N_APPENDS] / N_APPENDS, 1
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SNAPSHOT_r{round_no}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    shutil.rmtree(base)


if __name__ == "__main__":
    main()
