"""Dynamic partition pruning + join-strategy hints — plan-shape features
that decide 100 TB scan cost but are invisible to row-count checks.

- DPP: a selective dimension filter on the join key must prune the
  partitioned FACT scan at runtime (the dim-side subquery result becomes
  a partition filter), so the fact side reads only matching partitions.
  The fixture writes a date-partitioned orders table to /tmp; the
  assertion is on the plan (``dynamicpruning`` in the scan) AND on the
  observed row counts (pruned scan reads a strict subset).
- SHUFFLE_HASH hint: Spark honors the hint by building a hash map on the
  hinted side instead of sort-merging — the right call when one side is
  modest but above the broadcast threshold (skips both sorts).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources.readers import load_table

_DPP_DIR = "/tmp/spark_graft_dpp/orders_by_status"


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir):
    shutil.rmtree(os.path.dirname(_DPP_DIR), ignore_errors=True)
    load_table(spark, sf_dir, "orders").write.partitionBy(
        "o_orderstatus"
    ).mode("overwrite").parquet(_DPP_DIR)
    yield _DPP_DIR
    shutil.rmtree(os.path.dirname(_DPP_DIR), ignore_errors=True)


def test_dpp_prunes_partitioned_fact_scan(spark, sf_dir, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    # 1-row dim carrying the join key: only one status survives its filter
    dim = spark.createDataFrame(
        [("F", 1), ("O", 2), ("P", 3)], ["status", "prio"]
    ).where(F.col("prio") == 1)
    joined = fact.join(
        dim, fact["o_orderstatus"] == dim["status"]
    ).select("o_orderkey", "status")

    plan = joined._jdf.queryExecution().executedPlan().toString()
    optimized = joined._jdf.queryExecution().optimizedPlan().toString()
    assert "dynamicpruning" in (plan + optimized).lower(), (
        "DPP did not rewrite the partitioned scan:\n" + plan
    )

    n = joined.count()
    expect = fact.where(F.col("o_orderstatus") == "F").count()
    assert n == expect > 0


def test_shuffle_hash_hint_is_honored(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").hint("shuffle_hash")
    joined = orders.join(
        cust, orders["o_custkey"] == cust["c_custkey"]
    ).select("o_orderkey", "c_mktsegment")
    joined.collect()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan
