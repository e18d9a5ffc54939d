"""CHECK constraints on the snapshot store (sources/snapshots.py):
Delta ``ALTER TABLE ADD CONSTRAINT ... CHECK`` semantics re-expressed —
recorded in the manifest as table-level metadata, enforced on the NEW
rows of every write verb before publish, SQL NULL-passes semantics,
refusals leave only vacuum()-collectable orphans.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources.snapshots import (
    ConstraintViolationError,
    SnapshotStore,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


def _store(spark, sf_dir, tmp_path):
    st = SnapshotStore(str(tmp_path))
    orders = _orders(spark, sf_dir)
    st.commit(orders.limit(200), mode="overwrite", stats_cols=["o_orderkey"])
    return st, orders


def test_add_constraint_validates_existing_rows(spark, sf_dir, tmp_path):
    st, orders = _store(spark, sf_dir, tmp_path)
    v = st.add_constraint(spark, "price_nonneg", "o_totalprice >= 0")
    assert st.manifest(v)["mode"] == "alter"
    assert st.constraints() == {"price_nonneg": "o_totalprice >= 0"}
    # a constraint the current data violates refuses to be recorded
    with pytest.raises(ConstraintViolationError, match="price_huge"):
        st.add_constraint(spark, "price_huge", "o_totalprice > 1e18")
    assert "price_huge" not in st.constraints()
    # duplicate name refuses
    with pytest.raises(ValueError, match="already exists"):
        st.add_constraint(spark, "price_nonneg", "o_totalprice >= 1")


def test_commit_enforces_constraints(spark, sf_dir, tmp_path):
    st, orders = _store(spark, sf_dir, tmp_path)
    st.add_constraint(spark, "price_nonneg", "o_totalprice >= 0")
    before = st.latest_version()
    bad = orders.limit(5).withColumn("o_totalprice", F.lit(-1.0))
    with pytest.raises(ConstraintViolationError, match="price_nonneg"):
        st.commit(bad, mode="append")
    # nothing published; the orphaned data dir is vacuum-collectable
    assert st.latest_version() == before
    assert st.vacuum() != []
    # a valid batch still lands, constraint survives
    v = st.commit(orders.limit(5), mode="append")
    assert v == before + 1
    assert st.constraints(v) == {"price_nonneg": "o_totalprice >= 0"}
    # overwrite validates the full new state and carries the rule
    with pytest.raises(ConstraintViolationError, match="price_nonneg"):
        st.commit(bad, mode="overwrite")
    st.commit(orders.limit(10), mode="overwrite")
    assert st.constraints() == {"price_nonneg": "o_totalprice >= 0"}


def test_null_passes_like_sql_check(spark, sf_dir, tmp_path):
    st, orders = _store(spark, sf_dir, tmp_path)
    st.add_constraint(spark, "prio_known", "o_orderpriority <> 'BOGUS'")
    nulls = orders.limit(3).withColumn(
        "o_orderpriority", F.lit(None).cast("string")
    )
    v = st.commit(nulls, mode="append")  # NULL evaluates UNKNOWN -> passes
    assert st.latest_version() == v
    with pytest.raises(ConstraintViolationError, match="prio_known"):
        st.commit(
            orders.limit(1).withColumn("o_orderpriority", F.lit("BOGUS")),
            mode="append",
        )


def test_update_and_merge_enforce_on_post_images(spark, sf_dir, tmp_path):
    """The post-image is what must satisfy the rule — a partial update
    can violate a multi-column constraint even when the batch columns
    alone look fine."""
    st, orders = _store(spark, sf_dir, tmp_path)
    st.add_constraint(spark, "price_cap", "o_totalprice <= 1e9")
    with pytest.raises(ConstraintViolationError, match="price_cap"):
        st.update_where(
            spark,
            F.col("o_orderkey") % 7 == 0,
            {"o_totalprice": F.col("o_totalprice") + F.lit(2e9)},
        )
    v_ok = st.update_where(
        spark, F.col("o_orderkey") % 7 == 0, {"o_totalprice": F.lit(1.0)}
    )
    assert st.manifest(v_ok)["mode"] == "update"
    # merge (CoW) and merge_on_read refuse violating upserts
    bad = (
        orders.limit(4)
        .withColumn("o_totalprice", F.lit(2e9))
        .withColumn("_op", F.lit("upsert"))
    )
    with pytest.raises(ConstraintViolationError, match="price_cap"):
        st.merge(spark, bad, keys=["o_orderkey"])
    with pytest.raises(ConstraintViolationError, match="price_cap"):
        st.merge_on_read(spark, bad, keys=["o_orderkey"])
    ok = (
        orders.limit(4)
        .withColumn("o_totalprice", F.lit(5.0))
        .withColumn("_op", F.lit("upsert"))
    )
    v2 = st.merge_on_read(spark, ok, keys=["o_orderkey"])
    assert v2 > v_ok
    # pruned CoW merge path enforces too
    with pytest.raises(ConstraintViolationError, match="price_cap"):
        st.merge(spark, bad, keys=["o_orderkey"], prune=True)


def test_drop_constraint_and_multi_constraint_error_names(
    spark, sf_dir, tmp_path
):
    st, orders = _store(spark, sf_dir, tmp_path)
    st.add_constraint(spark, "a_pos", "o_totalprice >= 0")
    st.add_constraint(spark, "b_key", "o_orderkey >= 0")
    bad = (
        orders.where(F.col("o_orderkey") > 0)
        .limit(2)
        .withColumn("o_totalprice", F.lit(-5.0))
        .withColumn("o_orderkey", F.col("o_orderkey") * -1)
    )
    with pytest.raises(ConstraintViolationError) as ei:
        st.commit(bad, mode="append")
    # the error names BOTH violated rules
    assert "a_pos" in str(ei.value) and "b_key" in str(ei.value)
    st.drop_constraint("a_pos")
    assert st.constraints() == {"b_key": "o_orderkey >= 0"}
    with pytest.raises(ValueError, match="no constraint"):
        st.drop_constraint("a_pos")
    # with a_pos gone, a negative price lands; b_key still enforces
    st.commit(
        orders.limit(1).withColumn("o_totalprice", F.lit(-5.0)),
        mode="append",
    )
    with pytest.raises(ConstraintViolationError, match="b_key"):
        st.commit(
            orders.where(F.col("o_orderkey") > 0)
            .limit(1)
            .withColumn("o_orderkey", F.col("o_orderkey") * -1),
            mode="append",
        )


def test_constraints_survive_compact_and_delete(spark, sf_dir, tmp_path):
    st, orders = _store(spark, sf_dir, tmp_path)
    st.add_constraint(spark, "price_nonneg", "o_totalprice >= 0")
    st.delete_where(spark, F.col("o_orderkey") % 3 == 0)
    st.compact(spark)
    st.compact_masked(spark)
    assert st.constraints() == {"price_nonneg": "o_totalprice >= 0"}
    # history keeps serving; reads unaffected
    assert st.read(spark).count() > 0


def test_subset_append_null_passes_constraint_column(
    spark, sf_dir, tmp_path
):
    """r13 ADVICE regression: a legal subset append that OMITS the
    column a CHECK constraint references must NULL-backfill under the
    manifest schema and land (SQL NULL-passes) — not fail column
    resolution and block the valid write."""
    st, orders = _store(spark, sf_dir, tmp_path)
    st.add_constraint(spark, "price_nonneg", "o_totalprice >= 0")
    before = st.latest_version()
    subset = orders.select("o_orderkey", "o_orderpriority").limit(5)
    v = st.commit(subset, mode="append")  # omits o_totalprice entirely
    assert v == before + 1
    got = st.read(spark)
    assert got.where(F.col("o_totalprice").isNull()).count() == 5
    # a violating batch still refuses through the schema-backfilled read
    with pytest.raises(ConstraintViolationError, match="price_nonneg"):
        st.commit(
            orders.limit(1).withColumn("o_totalprice", F.lit(-1.0)),
            mode="append",
        )


def test_txn_replay_is_idempotent_past_new_constraint(
    spark, sf_dir, tmp_path
):
    """r13 ADVICE regression: a duplicate-batch writer retry arriving
    AFTER a later add_constraint must take the idempotent no-op return,
    not re-validate (and spuriously raise) on rows that already
    landed."""
    st, orders = _store(spark, sf_dir, tmp_path)
    batch = orders.limit(5).withColumn("o_totalprice", F.lit(-1.0))
    st.commit(batch, mode="append", txn=("app", 1))
    # the batch's rows violate the LATER rule, so clean them first and
    # record the rule against the cleaned state
    st.delete_where(spark, F.col("o_totalprice") < 0)
    st.add_constraint(spark, "price_nonneg", "o_totalprice >= 0")
    latest = st.latest_version()
    # a plain replay takes commit()'s cheap pre-write short-circuit
    assert st.commit(batch, mode="append", txn=("app", 1)) == latest
    # the RACING twin (pre-check saw a stale manifest, data written,
    # idempotence re-checked inside the OCC loop): must hit the in-loop
    # txn check BEFORE constraint enforcement and no-op, not raise
    orig = st.last_txn
    st.last_txn = lambda app: None  # simulate the stale pre-check
    try:
        got = st.commit(batch, mode="append", txn=("app", 1))
    finally:
        st.last_txn = orig
    assert got == latest
    assert st.latest_version() == latest
    assert st.vacuum() != []  # the twin's data dir is an orphan
