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
 5. plan_lint            -> PLANAUDIT_r{N}.json
 6. shuffle_report sf0.1 -> SHUFFLE_r{N}.json, budget-gated against the
    newest prior SHUFFLE_r{M}.json (M < N) if one exists
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
        ("plan_lint", [sys.executable, "tools/plan_lint.py",
                       f"--json=PLANAUDIT_r{n}.json"]),
        ("shuffle", [sys.executable, "tools/shuffle_report.py",
                     "/root/testdata/sf0.1", f"--json=SHUFFLE_r{n}.json"]),
        ("explains", [sys.executable, "tools/explain_dump.py"]),
        ("bench", [sys.executable, "bench.py"]),
    ]
    baseline = _prior_shuffle_baseline(n)
    if baseline:
        steps[5][1].append(f"--budget={os.path.basename(baseline)}")

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
            # last stdout line is the one-line JSON contract
            for ln in reversed(proc.stdout.strip().splitlines()):
                if ln.startswith("{"):
                    with open(os.path.join(REPO, f"BENCH_LOCAL_r{n}.json"),
                              "w") as fh:
                        fh.write(ln + "\n")
                    break

    ok = all(r["status"] in ("ok", "skipped") for r in results.values())
    print(json.dumps({"round": n, "ok": ok,
                      "steps": {k: v["status"] for k, v in results.items()}}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
