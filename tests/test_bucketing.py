"""Bucketed-table co-located join: writing both join sides bucketed by the
join key lets Spark plan a SortMergeJoin with NO shuffle exchange — the
storage-level co-location strategy for repeatedly-joined 100 TB fact tables.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def warehouse(spark):
    # NB: spark.sql.warehouse.dir is a static conf — tables land in the
    # default warehouse; DROP TABLE removes the managed files afterwards.
    # An interrupted earlier run can leave the managed LOCATION on disk
    # with no catalog entry (fresh in-memory catalog each session), and
    # saveAsTable then refuses with LOCATION_ALREADY_EXISTS — clear such
    # orphans before writing.
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for t in ("orders_b", "lineitem_b"):
        if not spark.catalog.tableExists(t):
            shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield "default-warehouse"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    # disable broadcast so the join strategy decision is about co-location,
    # not table size
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        n = joined.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert n > 0
    assert "SortMergeJoin" in plan
    # co-located buckets: the join needs NO shuffle on either side
    assert "Exchange hashpartitioning" not in plan


def test_bucketed_join_values_match_plain(spark, warehouse):
    plain = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_SMALL}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    bucketed = (
        spark.table("lineitem_b")
        .join(spark.table("orders_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert bucketed == plain
