"""Unit tests for the Delta-style MERGE emulation (operators/merge.py)."""

from __future__ import annotations

import pytest

from big_data_assignment2_2025_spark.operators.merge import merge_upsert


def _by_key(rows):
    return {r.k: r for r in rows}


def test_merge_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "tag", "v"]
    )
    source = spark.createDataFrame([(2, 99.0), (4, 40.0)], ["k", "v"])
    got = _by_key(merge_upsert(target, source, on=["k"]).collect())

    assert set(got) == {1, 2, 3, 4}
    assert (got[1].v, got[1].merge_action) == (10.0, "keep")
    assert (got[2].v, got[2].merge_action) == (99.0, "update")
    assert (got[3].v, got[3].merge_action) == (30.0, "keep")
    assert (got[4].v, got[4].merge_action) == (40.0, "insert")
    # target-only column passes through; null on inserted rows
    assert got[2].tag == "b" and got[4].tag is None


def test_merge_null_key_matches_itself(spark):
    target = spark.createDataFrame([(None, 1.0), (5, 5.0)], "k int, v double")
    source = spark.createDataFrame([(None, 2.0)], "k int, v double")
    got = merge_upsert(target, source, on=["k"]).collect()
    actions = {r.k: r.merge_action for r in got}
    # eqNullSafe: the null key updates in place instead of duplicating
    assert len(got) == 2
    assert actions[None] == "update" and actions[5] == "keep"
    assert {r.v for r in got if r.k is None} == {2.0}


def test_merge_partial_update_keeps_target_value(spark):
    target = spark.createDataFrame([(1, "x", 1.0)], "k int, tag string, v double")
    source = spark.createDataFrame([(1, None, 9.0)], "k int, tag string, v double")
    (row,) = merge_upsert(target, source, on=["k"]).collect()
    # null source column = "no change" (coalesce falls back to target)
    assert (row.tag, row.v, row.merge_action) == ("x", 9.0, "update")


def test_merge_missing_key_raises(spark):
    df = spark.createDataFrame([(1, 1.0)], "k int, v double")
    with pytest.raises(ValueError, match="merge key"):
        merge_upsert(df, df.select("v"), on=["k"])


def test_merge_idempotent(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], ["k", "name", "v"]
    )
    staging = spark.createDataFrame(
        [(2, "B", 99.0), (4, "d", 40.0)], ["k", "name", "v"]
    )
    once = merge_upsert(target, staging, on=["k"]).drop("merge_action")
    twice = merge_upsert(once, staging, on=["k"]).drop("merge_action")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_merge_result_invariant_to_partitioning(spark):
    target = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], ["k", "v"]
    )
    staging = spark.createDataFrame(
        [(i, float(-i)) for i in range(25, 75)], ["k", "v"]
    )
    a = merge_upsert(target, staging, on=["k"])
    b = merge_upsert(target.repartition(7), staging.repartition(3), on=["k"])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
