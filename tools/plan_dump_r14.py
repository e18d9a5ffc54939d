"""Dump `.explain("formatted")` of named queries to plans/r14/<q>_<tag>.txt.

Usage: python tools/plan_dump_r14.py <before|after> <query...>
(sf dir from $SPARK_GRAFT_SF_DIR, default sf0.1 — same as the bench.)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_assignment2_2025_spark.plans import QUERIES
from big_data_assignment2_2025_spark.session import get_spark
from tools.explain_dump import explain_str


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"plan_dump_{tag}")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df).rstrip() + "\n")
        print(path)


if __name__ == "__main__":
    main()
