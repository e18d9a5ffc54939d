"""Accuracy bounds for the approximate aggregates — the 100 TB scale path
for distinct counts (HyperLogLog++) and quantiles (KLL-style sketch).

These cannot be DuckDB-hash-gated (sketch implementations differ across
engines by design), so the contract is tolerance against the exact answer:
approx_count_distinct's documented default rsd is 5%; percentile_approx
with accuracy=10000 must land within the value-neighborhood of the exact
rank statistic.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = li.select(F.countDistinct("l_orderkey").alias("n")).first()["n"]
    # rsd is a STANDARD DEVIATION, not a bound — ask for 1% and allow 3σ
    approx = li.select(
        F.approx_count_distinct("l_orderkey", 0.01).alias("n")
    ).first()["n"]
    assert abs(approx - exact) / exact < 0.03, (approx, exact)
    # grouped variant: every group within 10% (small groups have higher
    # variance; the default rsd guarantee is per-sketch)
    ex = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    ap = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.approx_count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(ex) == set(ap)
    for k in ex:
        assert abs(ap[k] - ex[k]) / ex[k] < 0.10, (k, ap[k], ex[k])


def test_percentile_approx_near_exact(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = li.select(
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("c")
    )
    for q in (0.1, 0.5, 0.9):
        exact = cents.select(
            F.expr(f"percentile(c, {q})").alias("p")
        ).first()["p"]
        approx = cents.select(
            F.expr(f"percentile_approx(c, {q}, 10000)").alias("p")
        ).first()["p"]
        # within 1% of the exact quantile VALUE (prices span ~1e4..1e7
        # cents; a rank-epsilon of 1/10000 maps to well under 1% in value)
        assert abs(approx - exact) <= max(0.01 * abs(exact), 1), (
            q,
            approx,
            exact,
        )
