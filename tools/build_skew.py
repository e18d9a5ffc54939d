"""Build the SKEWED oracle-fixture twin (round 12, r11 verdict #6).

``tools/build_sf10x.py`` scales every table uniformly — but real 100 TB
tables are zipfian, and until now AQE skew handling was config-asserted,
not oracle-witnessed. This builder derives a skewed twin of the 10x
fixture: the fact tables' join/grouping keys are remapped so a handful
of HOT keys carry a fixed fraction of all rows (far beyond the verdict's
100x-median bar), while every dimension row, key domain and value column
stays intact — referential integrity holds because the hot keys are
existing copy-0 dimension keys.

Skew recipe (deterministic, mirrored by nothing — the oracle gate is
RELATIVE, Spark vs DuckDB over the same parquet, so the remap needs no
SQL twin):
- ``orders.o_custkey``: 10% of orders (o_orderkey % 10 = 0) land on 5
  hot customers (custkey 1..5)  -> ~300k orders/hot key vs ~10 median.
- ``lineitem.l_partkey``: 10% of lineitems on 5 hot parts.
- ``lineitem.l_suppkey``: a different 10% on 5 hot suppliers.
- ``events.user_id``: 10% of events on 2 hot users.
Everything else copies verbatim from the 10x fixture (which
tools/roundup.py keeps current).

The point of running the join/agg/window families over this fixture:
every shuffled hash join and aggregation sees one straggler-partition
key class, so a plan that silently depends on uniform key mass (wrong
AQE skew split, a salted join that drops salt groups, a window that
single-partitions a hot key) fails the hash gate HERE first.

Usage: python tools/build_skew.py [dst] [src]
       (defaults /tmp/sfskew_oracle, /tmp/sf10x_oracle)
Then:  python tools/oracle_check.py /tmp/sfskew_oracle \
           --match=q1,q2,q3,q4,q5,q6,q7,q8,q9,join_,window_,agg_,grouping,rollup,cube,pivot,unpivot,topk,cross_join,set_,sql_,correlated,orders_,skew \
           --json=ORACLE_SKEW_r{N}.json
"""

from __future__ import annotations

import os
import shutil
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

BUILD_TAG = "skew-v1-hot10pct"

#: (table, remaps) — remap is (target_col, selector_col, mod, n_hot)
SKEWS: dict[str, list[tuple[str, str, int, int]]] = {
    "orders": [("o_custkey", "o_orderkey", 0, 5)],
    "lineitem": [
        ("l_partkey", "l_orderkey", 1, 5),
        ("l_suppkey", "l_orderkey", 2, 5),
    ],
    "events": [("user_id", "event_id", 3, 2)],
}

COPY_VERBATIM = [
    "region", "nation", "customer", "supplier", "part",
    "documents", "embeddings",
]


def build(dst: str, src: str) -> str:
    from big_data_assignment2_2025_spark.session import get_spark

    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker) and open(marker).read() == BUILD_TAG:
        print(f"# {dst} current ({BUILD_TAG})", file=sys.stderr)
        return dst
    if not os.path.exists(os.path.join(src, "_DONE")):
        raise SystemExit(
            f"source fixture {src} missing — run tools/build_sf10x.py first"
        )
    spark = get_spark(app_name="build_skew")
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    for t in COPY_VERBATIM:
        shutil.copytree(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"# {t}: copied", file=sys.stderr)
    for t, remaps in SKEWS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        for col, sel, mod_class, n_hot in remaps:
            # 10% of rows (selector % 10 == class) -> hot keys 1..n_hot;
            # the hot keys are copy-0 dimension keys, so FKs stay valid
            df = df.withColumn(
                col,
                F.when(
                    F.col(sel) % 10 == mod_class,
                    (F.col(sel) % n_hot + 1).cast(
                        dict(df.dtypes)[col]
                    ),
                ).otherwise(F.col(col)),
            )
        if t == "events":
            # keep the file-stream time-ordering contract of the source
            df = df.repartitionByRange(32, "ts").sortWithinPartitions("ts")
        else:
            df = df.repartition(32)
        df.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"# {t}: skewed", file=sys.stderr)
    open(marker, "w").write(BUILD_TAG)
    return dst


if __name__ == "__main__":
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfskew_oracle"
    src = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf10x_oracle"
    build(dst, src)
