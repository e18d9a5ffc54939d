"""Distributed-NTILE operator: bit-parity with a global ntile window, and
plan audits proving no unpartitioned window / no forced broadcast survives
in the quantile-segmentation queries (the round-3 scale-killers)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.ranking import (
    NtileSpec,
    with_global_ntiles,
    with_global_rank_cumsum,
)
from big_data_assignment2_2025_spark.plans import QUERIES
from tests.conftest import SF_SMALL


def _unpartitioned_windows(df):
    """Logical-plan walk collecting Window nodes with an empty
    partitionSpec — each one is a single-partition global sort at scale."""

    def walk(node):
        yield node
        cs = node.children()
        for i in range(cs.size()):
            yield from walk(cs.apply(i))

    plan = df._jdf.queryExecution().optimizedPlan()
    return [
        n.toString().splitlines()[0]
        for n in walk(plan)
        if n.nodeName() == "Window" and n.partitionSpec().size() == 0
    ]


def _tied_df(spark, n: int):
    # heavy ties (7 distinct metric values) exercise tie groups that span
    # range-bucket boundaries — the case a value-cut quantile would get wrong
    return spark.range(n).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )


@pytest.mark.parametrize("n,tiles", [(137, 4), (137, 10), (5, 10), (40, 40)])
def test_matches_global_ntile_bitwise(spark, n, tiles):
    df = _tied_df(spark, n)
    got = with_global_ntiles(
        df,
        [NtileSpec("t", -F.col("v"), [F.desc("v"), F.col("id").asc()])],
        n_tiles=tiles,
        n_buckets=8,
    )
    w = Window.orderBy(F.desc("v"), F.col("id").asc())
    want = df.withColumn("t", F.ntile(tiles).over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multiple_specs_and_empty_input(spark):
    df = _tied_df(spark, 60)
    got = with_global_ntiles(
        df,
        [
            NtileSpec("a", F.col("v"), [F.col("v").asc(), F.col("id").asc()]),
            NtileSpec("b", -F.col("id"), [F.col("id").desc()]),
        ],
        n_tiles=4,
    )
    wa = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    wb = Window.orderBy(F.col("id").desc())
    want = df.withColumn("a", F.ntile(4).over(wa)).withColumn(
        "b", F.ntile(4).over(wb)
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    empty = _tied_df(spark, 60).where(F.lit(False))
    got_empty = with_global_ntiles(
        empty, [NtileSpec("a", F.col("v"), [F.col("v").asc()])], n_tiles=4
    )
    assert got_empty.collect() == []


@pytest.mark.parametrize("n,tiles", [(137, 4), (41, 10)])
def test_sub_key_composite_boundaries_match_ntile(spark, n, tiles):
    # ALL-TIED metric: metric-only boundaries would collapse to one bucket;
    # composite (key, tiebreak) boundaries must still be bit-exact vs ntile
    df = spark.range(n).select(F.col("id"), F.lit(7).alias("v"))
    got = with_global_ntiles(
        df,
        [
            NtileSpec(
                "t",
                -F.col("v"),
                [F.desc("v"), F.col("id").asc()],
                sub_key=F.col("id"),
            )
        ],
        n_tiles=tiles,
        n_buckets=8,
    )
    w = Window.orderBy(F.desc("v"), F.col("id").asc())
    want = df.withColumn("t", F.ntile(tiles).over(w))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_sub_key_splits_tied_metric_across_buckets(spark):
    # balance check: with one tied metric value and a unique sub_key, the
    # internal bucketing must NOT put all rows in a single window partition
    df = spark.range(400).select(F.col("id"), F.lit(1).alias("v"))
    out = with_global_ntiles(
        df,
        [
            NtileSpec(
                "t",
                -F.col("v"),
                [F.desc("v"), F.col("id").asc()],
                sub_key=F.col("id"),
            )
        ],
        n_tiles=4,
        n_buckets=8,
    )
    # correctness already asserted above; here assert the *plan* partitions
    # by the composite bucket column (a Window keyed on __b_t)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__b_t" in plan


def test_operator_plan_has_no_unpartitioned_window(spark):
    df = with_global_ntiles(
        _tied_df(spark, 100),
        [NtileSpec("t", -F.col("v"), [F.desc("v"), F.col("id").asc()])],
        n_tiles=4,
    )
    assert _unpartitioned_windows(df) == []


@pytest.mark.parametrize("n", [137, 40, 3])
def test_rank_cumsum_matches_window_prefix_sum(spark, n):
    df = spark.range(n).select(
        F.col("id"), ((F.col("id") * 37) % 11 * 100).alias("cents")
    )
    got = with_global_rank_cumsum(
        df,
        NtileSpec(
            "p",
            -F.col("cents"),
            [F.desc("cents"), F.col("id").asc()],
            sub_key=F.col("id"),
        ),
        value=F.col("cents"),
        n_buckets=8,
    )
    w = Window.orderBy(F.desc("cents"), F.col("id").asc())
    want = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "cum_value",
        F.sum("cents").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    key = lambda r: r["id"]  # noqa: E731
    assert sorted(map(dict, (r.asDict() for r in got.collect())), key=key) == sorted(
        map(dict, (r.asDict() for r in want.collect())), key=key
    )
    assert _unpartitioned_windows(got) == []


@pytest.mark.parametrize(
    "name",
    [
        "rfm_segmentation",
        "user_ltv_deciles",
        "doc_quality_quartiles",
        "training_mix_sample",
        "customer_pareto_8020",
    ],
)
def test_quantile_queries_have_no_global_sort_window(spark, name):
    bad = _unpartitioned_windows(QUERIES[name](spark, SF_SMALL))
    assert bad == [], f"unpartitioned Window in {name}: {bad}"


def test_jaccard_sizes_join_not_forced_broadcast(spark):
    """With every auto-broadcast threshold disabled, NO BroadcastHashJoin
    may remain in the jaccard plans: one would mean a F.broadcast() hint is
    forcing the per-document sizes frame (or any other side) past the size
    check — the guaranteed-OOM pattern at corpus scale."""
    from big_data_assignment2_2025_spark.operators.dedup import (
        jaccard_for_pairs,
        jaccard_pairs,
        shingles_df,
    )
    from big_data_assignment2_2025_spark.sources.readers import load_table

    sh = shingles_df(load_table(spark, SF_SMALL, "documents"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        for df in (
            jaccard_pairs(sh),
            jaccard_for_pairs(
                sh,
                sh.select(F.col("doc_id").alias("doc1")).limit(3).crossJoin(
                    sh.select(F.col("doc_id").alias("doc2")).limit(3)
                ),
            ),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is None:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe
            )
