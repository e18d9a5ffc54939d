"""Snapshot-store writer transactions (Delta's ``txn`` action) and the
streaming foreachBatch sink built on them (streaming/stream.py
``run_streaming_snapshot_sink``): exactly-once micro-batch ingestion —
a replayed batch id is a silent no-op, so crash-between-commit-and-
checkpoint restarts never duplicate rows."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources.snapshots import SnapshotStore
from big_data_assignment2_2025_spark.streaming.stream import (
    run_streaming_snapshot_sink,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )


def test_txn_replay_is_noop(spark, sf_dir, tmp_path):
    st = SnapshotStore(str(tmp_path))
    orders = _orders(spark, sf_dir)
    b0 = orders.limit(100)
    v0 = st.commit(b0, txn=("app", 0))
    n0 = st.read(spark).count()
    # exact replay: same app, same batch id — version and rows unchanged
    assert st.commit(b0, txn=("app", 0)) == v0
    assert st.latest_version() == v0
    assert st.read(spark).count() == n0
    # a LOWER id (late straggler of an already-superseded batch) is a
    # no-op too: the guard is monotone, like streaming batch ids
    st.commit(orders.limit(10), txn=("app", 2))
    assert st.commit(orders.limit(10), txn=("app", 1)) == st.latest_version()
    assert st.last_txn("app") == 2
    # an unrelated app has its own counter
    v = st.commit(orders.limit(5), txn=("other", 0))
    assert st.manifest(v)["txns"] == {"app": 2, "other": 0}


def test_txn_map_survives_every_publish(spark, sf_dir, tmp_path):
    """compact / merge / alter / spec-change all carry the txn map —
    losing it would re-open the door to duplicate replays."""
    st = SnapshotStore(str(tmp_path))
    orders = _orders(spark, sf_dir)
    st.commit(orders, mode="overwrite", txn=("app", 7))
    st.add_column("note", "string")
    st.set_partition_spec([])
    st.compact(spark)
    changes = (
        orders.limit(1)
        .withColumn("o_totalprice", F.lit(1.0))
        .withColumn("_op", F.lit("upsert"))
    )
    st.merge(spark, changes, keys=["o_orderkey"])
    assert st.last_txn("app") == 7
    # and the replay guard still bites after all that history
    v = st.latest_version()
    assert st.commit(orders.limit(3), txn=("app", 7)) == v


def test_streaming_sink_matches_batch(spark, sf_dir):
    got = {
        r["event_type"]: (r["n_events"], r["sum_cents"])
        for r in run_streaming_snapshot_sink(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["s"])
        for r in spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"),
        )
        .collect()
    }
    assert got == want


def test_streaming_sink_multi_batch_versions(spark, sf_dir):
    """3-file source + maxFilesPerTrigger=1 => 3 micro-batches => 3 store
    versions, content exact; the version history doubles as the batch
    audit trail."""
    from big_data_assignment2_2025_spark.sources.readers import (
        normalize_event_ts,
    )

    src_dir = tempfile.mkdtemp(prefix="sink_src_")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src_dir}/part{i}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = normalize_event_ts(
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src_dir}/part*.parquet")
    )
    out = run_streaming_snapshot_sink(spark, sf_dir, source=stream)
    total = out.agg(F.sum("n_events")).first()[0]
    assert total == ev.count()
