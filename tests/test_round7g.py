"""Round-7g: seasonal decomposition — identity and determinism checks."""

from __future__ import annotations

from big_data_assignment2_2025_spark.plans.round7g_queries import (
    events_seasonal_decompose,
)


def test_decomposition_identity_holds(spark, sf_dir):
    rows = events_seasonal_decompose(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        # additive identity: value = trend + seasonal + remainder, up to
        # the two independent output roundings (each 0.5e-6)
        recon = r["trend"] + r["seasonal"] + r["remainder"]
        assert abs(recon - r["value"]) < 5e-6, r


def test_seasonal_means_are_centered(spark, sf_dir):
    import collections

    rows = events_seasonal_decompose(spark, sf_dir).collect()
    # remainder sums to ~0 within each day-of-week class by construction
    by_dow = collections.defaultdict(list)
    for r in rows:
        by_dow[r["day"].toordinal() % 7].append(r["remainder"])
    for dow, rem in by_dow.items():
        assert abs(sum(rem) / len(rem)) < 1e-4, (dow, rem)


def test_decompose_is_run_deterministic(spark, sf_dir):
    a = [tuple(r) for r in events_seasonal_decompose(spark, sf_dir).collect()]
    b = [tuple(r) for r in events_seasonal_decompose(spark, sf_dir).collect()]
    assert a == b
