"""Edge-semantics tests for as-of and banded range joins."""

from __future__ import annotations

from big_data_assignment2_2025_spark.operators.temporal import (
    asof_join,
    range_join_banded,
)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (1, 50, "c"), (2, 100, "d")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 200, 20.0), (2, 150, 30.0)], ["k", "t", "v"]
    )
    out = {
        r.tag: r.v_asof
        for r in asof_join(left, right, on="k", time_col="t", right_cols=["v"]).collect()
    }
    assert out["a"] == 10.0   # equal time matches (inclusive)
    assert out["b"] == 20.0   # latest prior, not first
    assert out["c"] is None   # nothing at-or-before -> NULL
    assert out["d"] is None   # right row is later -> NULL


def test_asof_no_cross_key_leak(spark):
    left = spark.createDataFrame([(1, 500, "x")], ["k", "t", "tag"])
    right = spark.createDataFrame([(2, 100, 9.0)], ["k", "t", "v"])
    rows = asof_join(left, right, on="k", time_col="t", right_cols=["v"]).collect()
    assert rows[0].v_asof is None


def test_range_join_banded_equals_naive(spark):
    import random

    rnd = random.Random(7)
    left = spark.createDataFrame(
        [(rnd.randint(1, 5), rnd.randint(0, 5000), i) for i in range(120)],
        ["k", "t", "lid"],
    )
    right = spark.createDataFrame(
        [(rnd.randint(1, 5), rnd.randint(0, 5000), i) for i in range(120)],
        ["k", "t", "rid"],
    )
    got = {
        (r.k, r.lid_l, r.rid_r)
        for r in range_join_banded(
            left, right, on="k", time_col="t", lower=0, upper=600, band=250
        ).collect()
    }
    lrows = left.collect()
    rrows = right.collect()
    want = {
        (lr.k, lr.lid, rr.rid)
        for lr in lrows
        for rr in rrows
        if lr.k == rr.k and 0 <= rr.t - lr.t <= 600
    }
    assert got == want


def test_range_join_negative_lower(spark):
    left = spark.createDataFrame([(1, 1000, 0)], ["k", "t", "lid"])
    right = spark.createDataFrame(
        [(1, 900, 0), (1, 1100, 1), (1, 1700, 2)], ["k", "t", "rid"]
    )
    got = {
        r.rid_r
        for r in range_join_banded(
            left, right, on="k", time_col="t", lower=-200, upper=200, band=100
        ).collect()
    }
    assert got == {0, 1}


def test_asof_forward_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 205, "b"), (1, 400, "c"), (2, 100, "d")],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 300, 30.0), (2, 99, 9.0)], ["k", "t", "v"]
    )
    out = {
        r.tag: r.v_asof
        for r in asof_join(
            left, right, on="k", time_col="t", right_cols=["v"],
            direction="forward",
        ).collect()
    }
    # a: right at same t=100 matches (inclusive); b: next is 300; c: none
    # after 400 -> NULL; d (k=2): right at 99 is BEFORE -> NULL
    assert out == {"a": 10.0, "b": 30.0, "c": None, "d": None}


def test_asof_bad_direction_raises(spark):
    import pytest

    df = spark.createDataFrame([(1, 1, 1.0)], ["k", "t", "v"])
    with pytest.raises(ValueError):
        asof_join(df, df, on="k", time_col="t", right_cols=["v"], direction="nearest")


def test_asof_differential_random(spark):
    """Differential test: random (key, time) data vs a pure-python reference
    for both directions, including duplicate left times and empty sides."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    pair = st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=40),  # time
    )
    lefts = st.lists(pair, min_size=1, max_size=12)
    rights = st.lists(pair, min_size=0, max_size=12)

    @given(lefts=lefts, rights=rights, direction=st.sampled_from(["backward", "forward"]))
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.too_slow,
                                     HealthCheck.function_scoped_fixture])
    def run(lefts, rights, direction):
        # right side must be unique per (key, time): dedupe keeping max payload
        rmap = {}
        for k, t in rights:
            rmap[(k, t)] = max(rmap.get((k, t), -1), t * 10 + k)
        left_df = spark.createDataFrame(
            [(i, k, t) for i, (k, t) in enumerate(lefts)], ["lid", "k", "t"]
        )
        right_df = spark.createDataFrame(
            [(k, t, v) for (k, t), v in rmap.items()] or [(99, -1, -1)],
            ["k", "t", "payload"],
        )
        got = {
            r["lid"]: r["payload_asof"]
            for r in asof_join(
                left_df, right_df, on="k", time_col="t",
                right_cols=["payload"], direction=direction,
            ).collect()
        }
        for i, (k, t) in enumerate(lefts):
            if direction == "backward":
                cands = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt <= t]
                want = max(cands)[1] if cands else None
            else:
                cands = [(rt, v) for (rk, rt), v in rmap.items() if rk == k and rt >= t]
                want = min(cands)[1] if cands else None
            if not rmap:
                want = None
            assert got[i] == want, (direction, i, k, t, got[i], want)

    run()
