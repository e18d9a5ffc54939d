"""Build the ~10x full-registry oracle fixture (round 11, VERDICT #5).

Correctness is proven at sf0.001/0.01/0.1 and the dedup/ANN scale probes
run SUBSETS at 50x — but the complete 300-query registry had never been
oracle-swept above sf0.1. This builder scales EVERY table of sf0.1 by
10x into an internally consistent fixture (sf~1: lineitem ~6M rows) so
``tools/oracle_check.py`` can run the whole registry against DuckDB
once at a scale where overflow, skew and plan-flip bugs that small
fixtures mask would surface.

Recipe (same discipline as tools/scale_probe.py's growth fixtures):
- 10 shifted copies per fact/dim table, every key column (and every
  foreign key referencing it) shifted by ``copy * SHIFT`` — referential
  integrity holds per copy, cross-copy keys never collide;
- ``region``/``nation`` stay 1x (shared small dims; nationkeys
  referenced by customer/supplier remain valid);
- ``documents.text`` is SALTED per copy (copy 0 verbatim, copy i
  prefixes every token with ``c{i}_``) so the corpus grows without
  growing duplicate density — unsalted copies would hand the char-gram
  dedup families a quadratic true-duplicate mass that is a different
  probe's job (tools/boilerplate_probe.py); ``n_chars`` is recomputed
  from the salted text;
- ``embeddings.embedding`` is cyclically rotated per copy (identical
  copies would share every LSH bucket by construction).

The oracle gate is RELATIVE (Spark vs DuckDB on the same parquet), so
any internally consistent fixture is a valid gate input; value-domain
columns (priorities, event types, languages) are preserved verbatim.

Usage: python tools/build_sf10x.py [dst_dir]   (default /tmp/sf10x_oracle)
Then:  python tools/oracle_check.py /tmp/sf10x_oracle --json=ORACLE_LOCAL_r11_10x.json
"""

from __future__ import annotations

import os
import shutil
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from pyspark.sql import functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10
SHIFT = 10**8
BUILD_TAG = "sf10x-v2-ts-ordered"

#: key columns shifted per copy, per table (empty = copy 1x verbatim)
SHIFTS: dict[str, list[str]] = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _salt_text(c, i: int):
    if i == 0:
        return c
    return c.withColumn(
        "text",
        F.concat_ws(
            " ",
            F.transform(
                F.split(F.col("text"), " "),
                lambda t: F.concat(F.lit(f"c{i}_"), t),
            ),
        ),
    )


def _rotate_embedding(c, i: int):
    if i == 0:
        return c
    return c.withColumn(
        "embedding",
        F.expr(
            f"concat(slice(embedding, {i * 7} % size(embedding) + 1,"
            f" size(embedding)),"
            f" slice(embedding, 1, {i * 7} % size(embedding)))"
        ),
    )


def build(dst: str) -> str:
    from big_data_assignment2_2025_spark.session import get_spark

    marker = os.path.join(dst, "_DONE")
    if os.path.exists(marker) and open(marker).read() == BUILD_TAG:
        print(f"# {dst} current ({BUILD_TAG})", file=sys.stderr)
        return dst
    spark = get_spark(app_name="build_sf10x")
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst, exist_ok=True)
    for t, keys in SHIFTS.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        if not keys:
            out = src
        else:
            parts = []
            for i in range(COPIES):
                c = src
                for col in keys:
                    c = c.withColumn(col, F.col(col) + F.lit(i * SHIFT))
                if t == "documents":
                    c = _salt_text(c, i)
                if t == "embeddings":
                    c = _rotate_embedding(c, i)
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionAll(p)
            if t == "documents":
                # recompute from the salted text, KEEPING the source
                # column type (bigint) — an int here propagated into a
                # staged store's recorded schema and tripped the merge
                # type guard downstream
                out = out.withColumn(
                    "n_chars", F.length("text").cast("long")
                )
        if t == "events":
            # the streaming gates consume this table as a FILE STREAM
            # (one micro-batch per part file): files must be time-ranged
            # or the watermark set by file 1 drops later files' rows as
            # late — a realism requirement (real streams arrive roughly
            # time-ordered), not a convenience
            out = out.repartitionByRange(32, "ts").sortWithinPartitions(
                "ts"
            )
        elif keys:
            out = out.repartition(32)
        else:
            out = out.repartition(1)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")
        print(f"# {t}: written", file=sys.stderr)
    open(marker, "w").write(BUILD_TAG)
    return dst


if __name__ == "__main__":
    build(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10x_oracle")
