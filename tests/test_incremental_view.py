"""Incremental materialized-view maintenance off the change feed.

The contract under test: after ANY sequence of row-level verbs, the
view equals a from-scratch groupBy of the source — maintained by
reading ONLY the change rows (receipts prove it); non-row-level verbs
(compaction, overwrite, restore) degrade to a declared rebuild; a
replayed refresh is a no-op (txn idempotence), never a double-count.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources.incremental_view import (
    IncrementalAggView,
)
from big_data_assignment2_2025_spark.sources.snapshots import SnapshotStore

from conftest import SF_SMALL


@pytest.fixture()
def orders(spark):
    return (
        spark.read.parquet(os.path.join(SF_SMALL, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("long")
        )
    )


def _want(store, spark):
    return {
        r["o_orderpriority"]: (r["n"], r["s"])
        for r in store.read(spark)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.sum("cents").alias("s"))
        .collect()
    }


def _got(mv, spark):
    return {
        r["o_orderpriority"]: (r["n_rows"], r["sum_cents"])
        for r in mv.read(spark).collect()
    }


def test_view_tracks_every_row_level_verb(spark, orders, tmp_path):
    store = SnapshotStore(str(tmp_path / "src"))
    k = F.col("o_orderkey")
    store.commit(
        orders.where(k % 2 == 0), mode="overwrite",
        stats_cols=["o_orderkey"],
    )
    mv = IncrementalAggView(
        str(tmp_path / "mv"), store, ["o_orderpriority"],
        {"sum_cents": "cents"},
    )
    assert mv.refresh(spark)["mode"] == "rebuild"  # bootstrap
    assert _got(mv, spark) == _want(store, spark)

    store.commit(orders.where(k % 2 == 1), mode="append")
    r = mv.refresh(spark)
    assert r["mode"] == "incremental" and r["change_rows"] > 0
    assert _got(mv, spark) == _want(store, spark)

    store.delete_where(spark, k % 7 == 0)
    assert mv.refresh(spark)["mode"] == "incremental"
    assert _got(mv, spark) == _want(store, spark)

    store.update_where(
        spark,
        F.col("o_orderpriority") == "1-URGENT",
        {"cents": F.col("cents") + F.lit(1).cast("long")},
    )
    assert mv.refresh(spark)["mode"] == "incremental"
    assert _got(mv, spark) == _want(store, spark)

    # MERGE: delete + upsert + insert in one batch
    snull = F.lit(None).cast("string")
    chg = (
        orders.where(k % 11 == 0).select(
            "o_orderkey", snull.alias("o_orderpriority"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit(None).cast("long").alias("cents"),
            F.lit("delete").alias("_op"),
        )
        .unionAll(
            orders.where(k % 13 == 1).select(
                (k + 10_000_000).alias("o_orderkey"),
                F.lit("MERGEINS").alias("o_orderpriority"),
                F.lit(1.0).alias("o_totalprice"),
                F.lit(100).cast("long").alias("cents"),
                F.lit("upsert").alias("_op"),
            )
        )
    )
    store.merge(spark, chg, keys=["o_orderkey"])
    assert mv.refresh(spark)["mode"] == "incremental"
    assert _got(mv, spark) == _want(store, spark)


def test_replay_and_noop_are_idempotent(spark, orders, tmp_path):
    store = SnapshotStore(str(tmp_path / "src"))
    store.commit(orders, mode="overwrite")
    mv = IncrementalAggView(
        str(tmp_path / "mv"), store, ["o_orderpriority"],
        {"sum_cents": "cents"},
    )
    mv.refresh(spark)
    before = _got(mv, spark)
    assert mv.refresh(spark)["mode"] == "noop"
    # a second handle on the same view dir (crash-retry twin): its
    # refresh must no-op on the txn watermark, not double-count
    twin = IncrementalAggView(
        str(tmp_path / "mv"), store, ["o_orderpriority"],
        {"sum_cents": "cents"},
    )
    assert twin.refresh(spark)["mode"] == "noop"
    assert _got(mv, spark) == before


def test_groups_leave_the_view_at_zero(spark, orders, tmp_path):
    store = SnapshotStore(str(tmp_path / "src"))
    store.commit(orders, mode="overwrite")
    mv = IncrementalAggView(
        str(tmp_path / "mv"), store, ["o_orderpriority"],
        {"sum_cents": "cents"},
    )
    mv.refresh(spark)
    gone = "1-URGENT"
    assert gone in _got(mv, spark)
    store.delete_where(spark, F.col("o_orderpriority") == gone)
    assert mv.refresh(spark)["mode"] == "incremental"
    got = _got(mv, spark)
    assert gone not in got
    assert got == _want(store, spark)


def test_compaction_triggers_declared_rebuild(spark, orders, tmp_path):
    store = SnapshotStore(str(tmp_path / "src"))
    k = F.col("o_orderkey")
    store.commit(orders.where(k % 2 == 0), mode="overwrite")
    mv = IncrementalAggView(
        str(tmp_path / "mv"), store, ["o_orderpriority"],
        {"sum_cents": "cents"},
    )
    mv.refresh(spark)
    store.compact(spark)
    store.commit(orders.where(k % 2 == 1), mode="append")
    r = mv.refresh(spark)
    assert r["mode"] == "rebuild"
    assert _got(mv, spark) == _want(store, spark)


def test_definition_mismatch_refuses(spark, orders, tmp_path):
    store = SnapshotStore(str(tmp_path / "src"))
    store.commit(orders, mode="overwrite")
    IncrementalAggView(
        str(tmp_path / "mv"), store, ["o_orderpriority"],
        {"sum_cents": "cents"},
    )
    with pytest.raises(ValueError, match="defined as"):
        IncrementalAggView(
            str(tmp_path / "mv"), store, ["o_orderpriority"],
            {"sum_cents": "cents * 2"},
        )


def test_count_only_view_and_key_collision_guard(spark, orders, tmp_path):
    store = SnapshotStore(str(tmp_path / "src"))
    store.commit(orders, mode="overwrite")
    mv = IncrementalAggView(
        str(tmp_path / "mvc"), store, ["o_orderpriority"]
    )
    mv.refresh(spark)
    got = {
        r["o_orderpriority"]: r["n_rows"]
        for r in mv.read(spark).collect()
    }
    want = {
        r["o_orderpriority"]: r["n"]
        for r in store.read(spark)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    with pytest.raises(ValueError, match="collide"):
        IncrementalAggView(
            str(tmp_path / "bad"), store, ["o_orderpriority"],
            {"o_orderpriority": "cents"},
        )
