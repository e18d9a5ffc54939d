"""One-command round evidence chain (r6 verdict, What's-missing #1: a
round that skips the artifact refresh leaves a hole in the audit trail —
this tool makes the whole chain a single invocation that either produces
every artifact or exits nonzero).

Runs, each in a FRESH subprocess (so no session state leaks between
steps, same isolation the grading driver has):

 1. pytest tests/ -q                       (gate: abort the chain on red)
 2. oracle_check sf0.01  -> ORACLE_LOCAL_r{N}.json
 3. oracle_check sf0.1   -> ORACLE_LOCAL_r{N}_sf01.json
 4. oracle_check --foreign sf0.01 -> ORACLE_FOREIGN_r{N}.json
 4b. oracle_check sf0.001 -> ORACLE_LOCAL_r{N}_sf0001.json (boundary sweep)
 4c. build_sf10x (idempotent, marker-gated) + oracle_check over the 10x
     fixture -> ORACLE_LOCAL_r{N}_10x.json — STANDING since r12 (r11
     verdict #1: every one of the 10x sweep's six catches was invisible
     at sf0.1; scale correctness is now gated every round, full
     registry, zero exclusions since the graph oracles were rewritten
     with materialized CTEs)
 4d. build_skew (zipfian twin of the 10x fixture) + oracle_check of the
     join/agg/window families -> ORACLE_SKEW_r{N}.json — STANDING since
     r12 (its first run caught window_running_sum's non-total window
     order the same day)
 5. plan_lint            -> PLANAUDIT_r{N}.json
 6. shuffle_report sf0.1 -> SHUFFLE_r{N}.json, budget-gated against the
    newest prior SHUFFLE_r{M}.json (M < N) if one exists; since r13 it
    also profiles the join/agg/window shapes on the uniform 10x fixture
    AND its zipfian twin (--skew), gated 2x within-run vs the uniform
    twin and round-over-round vs the prior skew section
 7. explain_dump         -> EXPLAINS.md
 8. bench.py             -> BENCH_LOCAL_r{N}.json (the driver writes the
    official BENCH_r{N}.json itself; the local copy pins a quiet-host
    number next to the shuffle artifacts)

Usage: python tools/roundup.py N [--skip=step,step]   (step names above)
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _prior_shuffle_baseline(round_no: int) -> str | None:
    best = None
    for path in glob.glob(os.path.join(REPO, "SHUFFLE_r*.json")):
        m = re.search(r"SHUFFLE_r(\d+)\.json$", path)
        if m and int(m.group(1)) < round_no:
            if best is None or int(m.group(1)) > best[0]:
                best = (int(m.group(1)), path)
    return best[1] if best else None


def _check_consistency(n: int, skip: set[str]) -> tuple[bool, str]:
    """All round-N artifacts must reflect the CURRENT registry size.

    r7 shipped ORACLE_FOREIGN at 260/275 and PLANAUDIT at 242/256 because
    the registry grew after those steps ran; this gate turns that partial
    refresh into a hard failure of the chain.
    """
    sys.path.insert(0, REPO)
    from big_data_assignment2_2025_spark.plans import QUERIES

    total = len(QUERIES)
    batch = sum(1 for q in QUERIES if not q.startswith("streaming_"))
    checks = {
        "oracle_sf001": (f"ORACLE_LOCAL_r{n}.json", "ran", total),
        "oracle_sf01": (f"ORACLE_LOCAL_r{n}_sf01.json", "ran", total),
        "oracle_sf0001": (f"ORACLE_LOCAL_r{n}_sf0001.json", "ran", total),
        "oracle_foreign": (f"ORACLE_FOREIGN_r{n}.json", "ran", total),
        "oracle_10x": (f"ORACLE_LOCAL_r{n}_10x.json", "ran", total),
        "plan_lint": (f"PLANAUDIT_r{n}.json", "audited", batch),
    }
    bad = []
    for step, (fname, key, want) in checks.items():
        if step in skip:
            continue
        path = os.path.join(REPO, fname)
        if not os.path.exists(path):
            bad.append(f"{fname}: missing")
            continue
        with open(path) as fh:
            doc = json.load(fh)
        got = doc.get(key, doc.get("summary", {}).get(key))
        if got != want:
            bad.append(f"{fname}: {key}={got}, registry={want}")
    if bad:
        return False, "STALE ARTIFACTS: " + "; ".join(bad)
    return True, f"all artifacts at registry count (total={total}, batch={batch})"


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if not args:
        sys.exit("usage: python tools/roundup.py ROUND_NUMBER [--skip=a,b]")
    n = int(args[0])
    skip = set()
    for a in sys.argv[1:]:
        if a.startswith("--skip="):
            skip.update(a.split("=", 1)[1].split(","))

    steps: list[tuple[str, list[str]]] = [
        ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
        ("oracle_sf001", [sys.executable, "tools/oracle_check.py",
                          "/root/testdata/sf0.01",
                          f"--json=ORACLE_LOCAL_r{n}.json"]),
        ("oracle_sf01", [sys.executable, "tools/oracle_check.py",
                         "/root/testdata/sf0.1",
                         f"--json=ORACLE_LOCAL_r{n}_sf01.json"]),
        ("oracle_foreign", [sys.executable, "tools/oracle_check.py",
                            "/root/testdata/sf0.01", "--foreign",
                            f"--json=ORACLE_FOREIGN_r{n}.json"]),
        # smallest SF: the empty-group / boundary-condition sweep (a query
        # that degenerates when a group or window is empty fails HERE first)
        ("oracle_sf0001", [sys.executable, "tools/oracle_check.py",
                           "/root/testdata/sf0.001",
                           f"--json=ORACLE_LOCAL_r{n}_sf0001.json"]),
        # the 10x sweep (standing since r12): the fixture build is a
        # no-op when the _DONE marker matches the build tag
        ("fixture_10x", [sys.executable, "tools/build_sf10x.py",
                         "/tmp/sf10x_oracle"]),
        ("oracle_10x", [sys.executable, "tools/oracle_check.py",
                        "/tmp/sf10x_oracle",
                        f"--json=ORACLE_LOCAL_r{n}_10x.json"]),
        # zipfian twin of the 10x fixture (standing since r12): the
        # join/agg/window families under hot-key skew — AQE skew
        # handling oracle-witnessed every round, not config-asserted
        ("fixture_skew", [sys.executable, "tools/build_skew.py",
                          "/tmp/sfskew_oracle", "/tmp/sf10x_oracle"]),
        ("oracle_skew", [sys.executable, "tools/oracle_check.py",
                         "/tmp/sfskew_oracle",
                         "--match=q1,q2,q3,q4,q5,q6,q7,q8,q9,join_,"
                         "window_,agg_,grouping,rollup,cube,pivot,"
                         "unpivot,topk,cross_join,set_,sql_,correlated,"
                         "orders_,skew",
                         f"--json=ORACLE_SKEW_r{n}.json"]),
        ("plan_lint", [sys.executable, "tools/plan_lint.py",
                       f"--json=PLANAUDIT_r{n}.json"]),
        ("shuffle", [sys.executable, "tools/shuffle_report.py",
                     "/root/testdata/sf0.1",
                     # skew section (standing since r13): the join/agg/
                     # window shapes profiled on the uniform 10x fixture
                     # AND its zipfian twin, gated at 2x within-run and
                     # round-over-round — a skew-shuffle regression fails
                     # the chain, not a vibe
                     "--skew=/tmp/sf10x_oracle:/tmp/sfskew_oracle",
                     f"--json=SHUFFLE_r{n}.json"]),
        ("explains", [sys.executable, "tools/explain_dump.py"]),
        ("bench", [sys.executable, "bench.py"]),
    ]
    baseline = _prior_shuffle_baseline(n)
    if baseline:
        # locate by NAME, not index — inserting a step must not silently
        # re-target the budget flag (it did once, when sf0.001 landed)
        for name, cmd in steps:
            if name == "shuffle":
                cmd.append(f"--budget={os.path.basename(baseline)}")

    results = {}
    for name, cmd in steps:
        if name in skip:
            results[name] = {"status": "skipped"}
            print(f"== {name}: SKIPPED", flush=True)
            continue
        print(f"== {name}: {' '.join(cmd[1:])}", flush=True)
        t0 = time.perf_counter()
        proc = subprocess.run(cmd, cwd=REPO, capture_output=True, text=True)
        sec = round(time.perf_counter() - t0, 1)
        tail = (proc.stdout or proc.stderr).strip().splitlines()[-3:]
        results[name] = {"status": "ok" if proc.returncode == 0 else "FAIL",
                         "rc": proc.returncode, "sec": sec, "tail": tail}
        for ln in tail:
            print(f"   {ln}", flush=True)
        print(f"   -> rc={proc.returncode} in {sec}s", flush=True)
        if proc.returncode != 0:
            print(f"ABORT: {name} failed — fix before producing artifacts",
                  flush=True)
            break
        if name == "bench":
            # bench.py writes the FULL per-query map to
            # BENCH_LOCAL_latest.json (stdout only carries the compact
            # driver line since r8); pin the full map per round
            latest = os.path.join(REPO, "BENCH_LOCAL_latest.json")
            if os.path.exists(latest):
                with open(latest) as fh:
                    full = fh.read()
                with open(os.path.join(REPO, f"BENCH_LOCAL_r{n}.json"),
                          "w") as fh:
                    fh.write(full)

    ok = all(r["status"] in ("ok", "skipped") for r in results.values())
    if ok:
        # Consistency gate (r7 verdict What's-wrong #2): every committed
        # artifact must carry the CURRENT registry count — a partial
        # refresh (foreign at 260/275, plan audit at 242/256 in r7) is an
        # error, not a warning.
        consistent, details = _check_consistency(n, skip)
        results["consistency"] = {"status": "ok" if consistent else "FAIL",
                                  "detail": details}
        print(f"== consistency: {details}", flush=True)
        ok = ok and consistent
    print(json.dumps({"round": n, "ok": ok,
                      "steps": {k: v["status"] for k, v in results.items()}}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
