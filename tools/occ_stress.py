"""Multi-process OCC stress for the snapshot store (round 11,
VERDICT #3).

The in-process race tests (tests/test_snapshots.py) inject conflicts by
interleaving calls on one driver; the UNTESTED production shape was two
genuinely independent Spark driver processes racing ``commit`` /
``merge`` / ``merge_on_read`` / ``compact`` against one store directory
— separate JVMs, separate Python interpreters, real filesystem-level
contention on the manifest log (atomic ``os.link`` publish + bounded
rebase is the whole concurrency story; this probe is what proves it
outside one process).

Phases (each asserted, results -> one JSON artifact):

A. **append melee** — W writers x C commits each, disjoint tagged rows.
   Zero lost updates: every (writer, commit) batch present EXACTLY once,
   final count == sum of all batches, version log == W*C appends.
B. **merge melee** — W writers each MERGE-upsert the SAME key set with
   writer-distinct values (read-modify-write: rebases must recompute,
   never blindly replay). Serializable outcome: every key carries the
   value of the SINGLE merge that landed last (one winner across ALL
   keys), and every writer landed exactly once (W new versions).
C. **merge-on-read melee** — same contract through the deletion-vector
   path (masks + appends instead of rewrites).
D. **compact-vs-append race** — compact() is non-rebaseable by contract:
   each racer either lands or raises SnapshotConflictError; the final
   table is bit-identical to the append-only expectation either way.
E. **deletion-vector melee** (round 12, r11 verdict #5) — four racing
   processes issue ``delete_where`` / ``update_where`` /
   ``merge_on_read`` / ``compact_masked`` against OVERLAPPING members
   of one store (disjoint key classes, so the final logical state is
   order-independent while every verb contends on the same manifest
   log and the same physical members). Asserted: the final table equals
   the relational expectation under ANY landing order (rebases must
   recompute against the new latest, never replay stale addresses), no
   member data was lost, and the manifest's ``deletes_rows`` telemetry
   reconciles row-for-row with a physical read of every referenced
   position-delete file.
F. **skewed deletion-vector melee** (round 13, r12 verdict #2) — the
   same four racing verbs over a ZIPFIAN member shape: one hot member
   holds 90% of a 4000-key domain, four cold members split the tail,
   so every verb's masks land mostly on the SAME hot member (the shape
   where pruned splits and member stats degrade at 100 TB). Same
   invariants: order-independent state, telemetry row-for-row.

Usage:
    python tools/occ_stress.py <out_json>                 # orchestrator
    python tools/occ_stress.py --writer <phase> <dir> <id> <n>  # child

Writers are plain subprocesses (one SparkSession each, local[2]); the
orchestrator asserts the end state with its own session and writes the
artifact. Exit nonzero on any violated invariant.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

W = int(os.environ.get("OCC_WRITERS", "4"))
C = int(os.environ.get("OCC_COMMITS", "4"))
ROWS = 100          # rows per append batch
KEYS = 50           # shared key universe for the merge phases
SKEW_KEYS = 4000    # key universe for the zipfian DV melee (phase F)


def _spark(app: str):
    from big_data_assignment2_2025_spark.session import get_spark

    return get_spark(app_name=app, master="local[2]", shuffle_partitions=2)


# ---------------------------------------------------------------- writers


def writer_append(store_dir: str, wid: int, n: int) -> None:
    from pyspark.sql import functions as F

    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotStore,
    )

    spark = _spark(f"occ_append_{wid}")
    st = SnapshotStore(store_dir)
    for i in range(n):
        df = spark.range(ROWS).select(
            (F.lit(wid) * 1000000 + F.lit(i) * 1000 + F.col("id")).alias(
                "row_id"
            ),
            F.lit(wid).alias("writer"),
            F.lit(i).alias("batch"),
        )
        st.commit(df, mode="append")
    print(f"writer {wid}: {n} appends landed")


def writer_merge(store_dir: str, wid: int, n: int, mor: bool) -> None:
    from pyspark.sql import functions as F

    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotStore,
    )

    spark = _spark(f"occ_merge_{wid}")
    st = SnapshotStore(store_dir)
    changes = spark.range(KEYS).select(
        F.col("id").alias("k"),
        F.lit(wid).alias("writer"),
        F.lit("upsert").alias("_op"),
    )
    if mor:
        v = st.merge_on_read(spark, changes, keys=["k"])
    else:
        v = st.merge(spark, changes, keys=["k"])
    print(f"writer {wid}: merge landed at v{v}")


def writer_dv(store_dir: str, wid: int, n: int) -> None:
    """One racing DV verb, selected by writer id; ``n`` is the key-
    universe size (KEYS for the uniform phase, SKEW_KEYS for the
    zipfian one). Key classes are disjoint (k mod 10) so the final
    state is order-independent; the members each verb masks OVERLAP,
    which is the contention the phase exists to prove safe."""
    from pyspark.sql import functions as F

    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotConflictError,
        SnapshotStore,
    )

    spark = _spark(f"occ_dv_{wid}")
    st = SnapshotStore(store_dir)
    if wid == 0:
        v = st.delete_where(spark, F.col("k") % 10 == 0)
        print(f"writer {wid}: delete_where landed at v{v}")
    elif wid == 1:
        v = st.update_where(
            spark, F.col("k") % 10 == 1, {"val": F.lit(1111)}
        )
        print(f"writer {wid}: update_where landed at v{v}")
    elif wid == 2:
        ups = spark.range(n).where(F.col("id") % 10 == 2).select(
            F.col("id").alias("k"),
            F.lit(2222).alias("val"),
            F.lit("upsert").alias("_op"),
        )
        dels = spark.range(n).where(F.col("id") % 10 == 3).select(
            F.col("id").alias("k"),
            F.lit(0).alias("val"),
            F.lit("delete").alias("_op"),
        )
        v = st.merge_on_read(spark, ups.unionAll(dels), keys=["k"])
        print(f"writer {wid}: merge_on_read landed at v{v}")
    else:
        try:
            v = st.compact_masked(spark, max_masked_fraction=0.01)
            print(f"writer {wid}: compact_masked landed at v{v}")
        except SnapshotConflictError as e:
            print(f"writer {wid}: compact_masked refused ({e})")
            sys.exit(42)  # clean refusal (non-rebaseable by contract)


def writer_compact(store_dir: str, wid: int, n: int) -> None:
    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotConflictError,
        SnapshotStore,
    )

    spark = _spark(f"occ_compact_{wid}")
    st = SnapshotStore(store_dir)
    try:
        v = st.compact(spark)
        print(f"writer {wid}: compact landed at v{v}")
    except SnapshotConflictError as e:
        # the documented loser behavior: refuse, never corrupt
        print(f"writer {wid}: compact refused ({e})")
        sys.exit(42)  # distinct code: a CLEAN refusal


# ----------------------------------------------------------- orchestrator


def _spawn(args: list[str]) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--writer", *args],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=HERE,
    )


def _join(procs: list[subprocess.Popen], ok_codes=(0,)) -> list[int]:
    codes = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        print(out.strip())
        codes.append(p.returncode)
        assert p.returncode in ok_codes, (
            f"writer crashed rc={p.returncode}: {out[-500:]}"
        )
    return codes


def phase_appends(spark, result: dict) -> str:
    from pyspark.sql import functions as F

    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotStore,
    )

    d = tempfile.mkdtemp(prefix="occ_appends_")
    st = SnapshotStore(d)
    st.commit(
        spark.createDataFrame([], "row_id long, writer int, batch int"),
        mode="overwrite",
    )
    t0 = time.perf_counter()
    _join([_spawn(["append", d, str(w), str(C)]) for w in range(W)])
    dt = time.perf_counter() - t0
    got = st.read(spark)
    n = got.count()
    batches = (
        got.groupBy("writer", "batch").count().where(F.col("count") != ROWS)
    ).count()
    versions = st.latest_version()
    ok = n == W * C * ROWS and batches == 0 and versions == 1 + W * C
    result["appends"] = {
        "writers": W, "commits_each": C, "rows": n,
        "expected_rows": W * C * ROWS, "bad_batches": batches,
        "versions": versions, "expected_versions": 1 + W * C,
        "wall_sec": round(dt, 1), "ok": ok,
    }
    assert ok, result["appends"]
    return d


def phase_merge(spark, result: dict, mor: bool) -> None:
    from pyspark.sql import functions as F

    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotStore,
    )

    d = tempfile.mkdtemp(prefix=f"occ_merge{'_mor' if mor else ''}_")
    st = SnapshotStore(d)
    base = spark.range(KEYS).select(
        F.col("id").alias("k"), F.lit(-1).alias("writer"),
        F.lit("seed").alias("_op"),
    ).drop("_op")
    st.commit(base, mode="overwrite", stats_cols=["k"])
    t0 = time.perf_counter()
    _join([
        _spawn(["merge_mor" if mor else "merge", d, str(w), "1"])
        for w in range(W)
    ])
    dt = time.perf_counter() - t0
    got = st.read(spark)
    winners = [
        r["writer"] for r in got.select("writer").distinct().collect()
    ]
    versions = st.latest_version()
    # serializable outcome: ONE winner across every key (the last merge
    # to land upserted all of them), every writer landed exactly once
    ok = (
        got.count() == KEYS
        and len(winners) == 1
        and winners[0] in range(W)
        and versions == 1 + W
    )
    key = "merge_on_read" if mor else "merge"
    result[key] = {
        "writers": W, "keys": KEYS, "rows": got.count(),
        "distinct_final_writers": sorted(winners),
        "versions": versions, "expected_versions": 1 + W,
        "wall_sec": round(dt, 1), "ok": ok,
    }
    assert ok, result[key]


def phase_compact(spark, appends_dir: str, result: dict) -> None:
    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotStore,
    )

    st = SnapshotStore(appends_dir)
    before = st.read(spark).count()
    t0 = time.perf_counter()
    procs = [_spawn(["compact", appends_dir, str(w), "1"]) for w in range(3)]
    procs.append(_spawn(["append", appends_dir, "99", "2"]))
    codes = _join(procs, ok_codes=(0, 42))
    dt = time.perf_counter() - t0
    landed = sum(1 for c in codes[:3] if c == 0)
    refused = sum(1 for c in codes[:3] if c == 42)
    after = st.read(spark).count()
    ok = (
        landed + refused == 3
        and after == before + 2 * ROWS  # the racing appends, nothing lost
    )
    result["compact_race"] = {
        "compactors": 3, "landed": landed, "refused": refused,
        "rows_before": before, "rows_after": after,
        "expected_after": before + 2 * ROWS,
        "wall_sec": round(dt, 1), "ok": ok,
    }
    assert ok, result["compact_race"]


def phase_dv_melee(spark, result: dict, skew: bool = False) -> None:
    from pyspark.sql import functions as F

    from big_data_assignment2_2025_spark.sources.snapshots import (
        SnapshotStore,
    )

    d = tempfile.mkdtemp(prefix="occ_dv_skew_" if skew else "occ_dv_")
    st = SnapshotStore(d)
    keys = SKEW_KEYS if skew else KEYS
    base = spark.range(keys).select(
        F.col("id").alias("k"), F.lit(0).alias("val")
    )
    if skew:
        # ZIPFIAN member shape (round 13, r12 verdict #2): ONE hot
        # member holds 90% of the key domain, four cold members split
        # the tail — every verb's mask set lands mostly on the same hot
        # member (hot-key member stats are where pruned splits degrade),
        # while key classes stay disjoint so the expected state is
        # order-independent
        hot_cut = (keys * 9) // 10
        st.commit(base.where(F.col("k") < hot_cut), mode="overwrite",
                  stats_cols=["k"])
        tail = (keys - hot_cut) // 4
        for i in range(4):
            lo = hot_cut + i * tail
            hi = keys if i == 3 else lo + tail
            st.commit(
                base.where((F.col("k") >= lo) & (F.col("k") < hi)),
                mode="append", stats_cols=["k"],
            )
    else:
        # two members, each holding every key class — every verb's mask
        # set OVERLAPS both members while key classes stay disjoint
        st.commit(base.where(F.col("k") % 2 == 0), mode="overwrite",
                  stats_cols=["k"])
        st.commit(base.where(F.col("k") % 2 == 1), mode="append",
                  stats_cols=["k"])
    seed_versions = st.latest_version()
    t0 = time.perf_counter()
    codes = _join(
        [_spawn(["dv", d, str(w), str(keys)]) for w in range(4)],
        ok_codes=(0, 42),
    )
    dt = time.perf_counter() - t0
    refused = sum(1 for c in codes if c == 42)
    # order-independent relational expectation: k%10==0 deleted,
    # k%10==3 merge-deleted, k%10==1 updated to 1111, k%10==2 upserted
    # to 2222, everything else untouched
    expect = {
        (k, 1111 if k % 10 == 1 else 2222 if k % 10 == 2 else 0)
        for k in range(keys)
        if k % 10 not in (0, 3)
    }
    got = {tuple(r) for r in st.read(spark).collect()}
    latest = st.latest_version()
    doc = st.manifest(latest)
    # telemetry reconciliation: every member's manifest masked-row count
    # must equal a PHYSICAL read of its referenced position-delete files
    deletes = doc.get("deletes") or {}
    dv_rows = doc.get("deletes_rows") or {}
    telemetry_ok = True
    for m, dirs in deletes.items():
        if not dirs:
            continue
        physical = (
            spark.read.schema("_file string, _pos long")
            .parquet(*[os.path.join(d, x) for x in sorted(set(dirs))])
            .where(F.col("_file").startswith(m + "/"))
            .count()
        )
        if physical != dv_rows.get(m, 0):
            telemetry_ok = False
    # 3 rebaseable verbs always land (+seeds); compact_masked lands
    # 0 or 1 versions (no-op/refusal vs publish)
    ok = (
        got == expect
        and telemetry_ok
        and seed_versions + 3 <= latest <= seed_versions + 4
        and refused <= 1
    )
    key = "dv_melee_skew" if skew else "dv_melee"
    result[key] = {
        "writers": 4, "keys": keys, "rows": len(got),
        "expected_rows": len(expect), "state_match": got == expect,
        "telemetry_reconciles": telemetry_ok,
        "seed_members": len(st.manifest(seed_versions)["members"]),
        "versions": latest, "compact_masked_refused": refused,
        "wall_sec": round(dt, 1), "ok": ok,
    }
    assert ok, result[key]


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--writer":
        phase, d, wid, n = sys.argv[2:6]
        if phase == "append":
            writer_append(d, int(wid), int(n))
        elif phase == "merge":
            writer_merge(d, int(wid), int(n), mor=False)
        elif phase == "merge_mor":
            writer_merge(d, int(wid), int(n), mor=True)
        elif phase == "compact":
            writer_compact(d, int(wid), int(n))
        elif phase == "dv":
            writer_dv(d, int(wid), int(n))
        else:
            raise SystemExit(f"unknown phase {phase}")
        return

    out_json = sys.argv[1] if len(sys.argv) > 1 else "OCCSTRESS.json"
    spark = _spark("occ_orchestrator")
    result: dict = {"writers": W, "commits_each": C}
    appends_dir = phase_appends(spark, result)
    phase_merge(spark, result, mor=False)
    phase_merge(spark, result, mor=True)
    phase_compact(spark, appends_dir, result)
    phase_dv_melee(spark, result)
    phase_dv_melee(spark, result, skew=True)
    result["all_ok"] = all(
        v.get("ok") for v in result.values() if isinstance(v, dict)
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: v for k, v in result.items()}, indent=1))
    assert result["all_ok"]


if __name__ == "__main__":
    main()
