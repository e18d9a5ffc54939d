"""Runtime-filter and sketch behavior that matters at 100 TB but is invisible
in row-count correctness checks.

- Runtime Bloom-filter join pruning: when a join's build side is small and
  selective, Spark can inject a bloom-filter probe (``might_contain``) into
  the OTHER side's scan so non-matching rows die at the scan instead of
  crossing the shuffle. The size thresholds that gate it are tuned for real
  clusters, so the test lowers them to fire on fixture-sized data — what we
  lock in is that our session/config shape leaves the feature ON and that
  the plan actually rewrites.
- Sketches: approx_count_distinct (HLL++) and approx_percentile must land
  within their documented error envelopes vs exact answers; they're the
  100 TB substitutes for exact distinct/percentile when a few % error is
  acceptable, and a misconfigured rsd would silently wreck downstream use.
"""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bloom_conf(spark):
    keys = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # fixture-sized data: drop the size gates so the rewrite can fire
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        # force a shuffle join: broadcast would make the bloom filter moot
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_on_selective_join(spark, sf_dir, bloom_conf):
    part = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .where(F.col("p_brand") == "Brand#1")  # selective build side
        .select("p_partkey", "p_brand")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity"
    )
    joined = li.join(part, li.l_partkey == part.p_partkey)
    plan = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, f"no runtime bloom filter in:\n{plan[:2000]}"
    # the rewrite must not change results
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    expected = joined.count()
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert joined.count() == expected


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact, approx = ev.agg(
        F.countDistinct("user_id").alias("e"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
    ).first()
    assert abs(approx - exact) / exact < 0.06  # 3x the 2% rsd


def test_native_corr_matches_exact_formulation(spark, sf_dir):
    # F.corr (float single-pass, order-dependent) must agree with the
    # exact-integer-moments corr of plans/relational.py:stats_corr to float
    # precision — guards the exact formulation against algebra mistakes
    from big_data_assignment2_2025_spark.plans.relational import stats_corr

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    native = {
        r["l_returnflag"]: r["c"]
        for r in li.groupBy("l_returnflag")
        .agg(F.corr("l_quantity", "l_extendedprice").alias("c"))
        .collect()
    }
    exact = {
        r["l_returnflag"]: r["qty_price_corr"]
        for r in stats_corr(spark, sf_dir.replace("file:", "")).collect()
    }
    assert set(native) == set(exact)
    for flag in native:
        assert abs(native[flag] - exact[flag]) < 1e-6


def test_approx_percentile_within_accuracy(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 1000)").alias("approx"),
    ).first()
    # approx_percentile(acc=1000) -> rank error <= n/1000; translate to a
    # loose value tolerance on this distribution
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
