"""Per-query time breakdown: DataFrame build (py4j + analysis), Catalyst
phases (parsing/analysis/optimization/planning, from QueryExecution's
tracker), and execution wall — so optimization effort lands where the time
actually goes (guide §1: measure first; a 2 s query that spends 1.4 s in
the optimizer needs a smaller plan, not a faster shuffle).

Usage: python tools/phase_probe.py <out_json> <n_runs> <query...>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    out_json, n_runs = sys.argv[1], int(sys.argv[2])
    names = sys.argv[3:]

    from big_data_assignment2_2025_spark.plans import QUERIES
    from big_data_assignment2_2025_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="phase_probe")
    spark.range(1000).selectExpr("sum(id)").collect()

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        best = None
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t1 = time.perf_counter()
            df.count()
            t_exec = time.perf_counter() - t1
            qe = df._jdf.queryExecution()
            phases = {
                str(k): v.durationMs()
                for k, v in dict(
                    spark._jvm.scala.collection.JavaConverters
                    .mapAsJavaMap(qe.tracker().phases())
                ).items()
            }
            rec = {
                "build_s": round(t_build, 3),
                "exec_s": round(t_exec, 3),
                "total_s": round(t_build + t_exec, 3),
                "phases_ms": phases,
            }
            if best is None or rec["total_s"] < best["total_s"]:
                best = rec
        out[name] = best
        print(f"# {name}: {json.dumps(best)}", file=sys.stderr)

    with open(out_json, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(out_json)


if __name__ == "__main__":
    main()
