"""Change data feed on the snapshot store (Delta CDF re-expressed):
merge() records pre/post images in a manifest-referenced directory;
read_changes() serves row-level deltas across appends AND merges — the
range diff() must refuse. The cross-engine gate is
``storage_change_feed``; these tests pin the mechanics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources.snapshots import SnapshotStore


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


def _merged_store(spark, sf_dir, tmp_path, prune=False):
    st = SnapshotStore(str(tmp_path))
    orders = _orders(spark, sf_dir)
    st.commit(
        orders.where(F.col("o_orderkey") % 2 == 0),
        mode="overwrite",
        stats_cols=["o_orderkey"],
    )
    st.commit(
        orders.where(F.col("o_orderkey") % 2 == 1),
        mode="append",
        stats_cols=["o_orderkey"],
    )
    ups = orders.where(F.col("o_orderkey") % 5 == 0).select(
        "o_orderkey",
        F.lit(1.0).alias("o_totalprice"),
        F.lit("upsert").alias("_op"),
    )
    dels = orders.where(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") % 5 != 0)
    ).select(
        "o_orderkey",
        F.lit(0.0).alias("o_totalprice"),
        F.lit("delete").alias("_op"),
    )
    # a no-op delete: a key far outside the table — must emit NOTHING
    ghost = spark.createDataFrame(
        [(10**9, 0.0, "delete")], "o_orderkey long, o_totalprice double, _op string"
    )
    v = st.merge(
        spark, ups.unionAll(dels).unionByName(ghost), keys=["o_orderkey"],
        prune=prune,
    )
    return st, orders, v


@pytest.mark.parametrize("prune", [False, True])
def test_feed_matches_table_transition(spark, sf_dir, tmp_path, prune):
    """Applying the feed's postimages/deletes to the pre-merge state
    reproduces the post-merge table exactly — the feed and the table can
    never tell different stories; identical through BOTH merge forms."""
    st, orders, v = _merged_store(spark, sf_dir, tmp_path, prune=prune)
    feed = st.read_changes(spark, v - 1, v)
    pre = st.read(spark, v - 1)
    post = st.read(spark, v)
    deleted = feed.where(F.col("_change_type") == "delete").select(
        "o_orderkey"
    )
    updated = feed.where(F.col("_change_type") == "update_postimage")
    inserted = feed.where(F.col("_change_type") == "insert")
    rebuilt = (
        pre.join(deleted, "o_orderkey", "left_anti")
        .join(
            updated.select("o_orderkey"), "o_orderkey", "left_anti"
        )
        .unionByName(updated.drop("_change_type", "_commit_version"))
        .unionByName(inserted.drop("_change_type", "_commit_version"))
    )
    got = {tuple(r) for r in rebuilt.collect()}
    want = {tuple(r) for r in post.collect()}
    assert got == want
    # no-op delete emitted nothing
    assert feed.where(F.col("o_orderkey") == 10**9).count() == 0
    # preimages carry the PRE-merge values
    pre_prices = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in feed.where(
            F.col("_change_type") == "update_preimage"
        ).collect()
    }
    want_pre = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in orders.where(F.col("o_orderkey") % 5 == 0).collect()
    }
    assert pre_prices == want_pre


def test_feed_spans_appends_and_merges(spark, sf_dir, tmp_path):
    st, orders, v = _merged_store(spark, sf_dir, tmp_path)
    feed = st.read_changes(spark, 1, v)
    ins = feed.where(F.col("_change_type") == "insert")
    # v2's append rows surface as inserts tagged with their version
    assert ins.where(F.col("_commit_version") == 2).count() == orders.where(
        F.col("o_orderkey") % 2 == 1
    ).count()
    assert set(
        r["_change_type"] for r in feed.select("_change_type").distinct().collect()
    ) == {"insert", "update_preimage", "update_postimage", "delete"}


def test_feed_refuses_compact_and_legacy_merge(spark, sf_dir, tmp_path):
    st, orders, v = _merged_store(spark, sf_dir, tmp_path, prune=True)
    assert st.manifest(v)["mode"] == "merge"  # pruned path ran
    vc = st.compact(spark)
    with pytest.raises(ValueError, match="compact"):
        st.read_changes(spark, v, vc)
    # a merge manifest without a recorded feed (pre-CDF lineage) errors
    # with the anti-join guidance instead of silently dropping deltas
    import json
    import os

    doc = st.manifest(v)
    doc.pop("changes")
    p = st._manifest_path(v)
    os.unlink(p)
    with open(p, "w") as fh:
        json.dump(doc, fh)
    with pytest.raises(ValueError, match="without a recorded change"):
        st.read_changes(spark, v - 1, v)


def test_vacuum_keeps_feed_directories(spark, sf_dir, tmp_path):
    st, orders, v = _merged_store(spark, sf_dir, tmp_path)
    n_before = st.read_changes(spark, v - 1, v).count()
    removed = st.vacuum()  # default: orphans only
    assert st.manifest(v)["changes"] not in removed
    assert st.read_changes(spark, v - 1, v).count() == n_before
