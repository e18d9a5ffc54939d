"""Writer-protocol guard (``min_reader_version``, Delta's reader
protocol re-expressed): every publish stamps the minimum reader
generation that serves the manifest's rows correctly, the stamp is
monotone across the lineage, and a reader that is OLDER than the stamp
refuses loudly on open — the r12 ADVICE class (silently ignored
manifest keys -> wrong rows) made structurally impossible one code
generation ahead."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.sources import snapshot_source
from big_data_assignment2_2025_spark.sources.snapshots import (
    _READER_VERSION,
    ProtocolVersionError,
    SnapshotStore,
)


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )


def test_reader_version_constants_in_sync():
    assert snapshot_source._READER_VERSION == _READER_VERSION


def test_version_bump_matrix(spark, sf_dir, tmp_path):
    """Feature -> stamp matrix: base 1, DVs 2, defaults/constraints 3,
    column mapping / identity 4 — and MONOTONE (compacting the DVs away
    does not re-admit readers that would mis-read the history)."""
    st = SnapshotStore(str(tmp_path))
    orders = _orders(spark, sf_dir)
    v1 = st.commit(orders.limit(40), mode="overwrite")
    assert st.manifest(v1)["min_reader_version"] == 1
    v2 = st.commit(orders.limit(5), mode="append")
    assert st.manifest(v2)["min_reader_version"] == 1
    v3 = st.delete_where(spark, F.col("o_orderkey") % 2 == 0)
    assert st.manifest(v3)["min_reader_version"] == 2
    v4 = st.compact(spark)  # DVs materialized away...
    assert not st.manifest(v4).get("deletes")
    assert st.manifest(v4)["min_reader_version"] == 2  # ...stamp stays
    v5 = st.add_constraint(spark, "nonneg", "o_totalprice >= 0")
    assert st.manifest(v5)["min_reader_version"] == 3
    v6 = st.rename_column("o_orderpriority", "prio")
    assert st.manifest(v6)["min_reader_version"] == 4
    # fresh store: defaults alone stamp 3, identity alone stamps 4
    st2 = SnapshotStore(str(tmp_path / "s2"))
    st2.commit(orders.limit(10), mode="overwrite")
    vd = st2.add_column("rc", "int", default=7)
    assert st2.manifest(vd)["min_reader_version"] == 3
    vi = st2.add_identity_column(spark, "row_id")
    assert st2.manifest(vi)["min_reader_version"] == 4


def test_old_reader_refuses_loudly(spark, sf_dir, tmp_path):
    st = SnapshotStore(str(tmp_path))
    st.commit(_orders(spark, sf_dir).limit(10), mode="overwrite")
    mp = st._manifest_path(1)
    doc = json.load(open(mp))
    doc["min_reader_version"] = _READER_VERSION + 1
    json.dump(doc, open(mp, "w"))
    with pytest.raises(ProtocolVersionError, match="requires reader"):
        st.read(spark)
    with pytest.raises(ProtocolVersionError):
        st.latest_version() is not None and st.manifest(1)
    # the format-API planner refuses identically
    with pytest.raises(ValueError, match="requires reader"):
        snapshot_source._load_manifest(str(tmp_path), 1)
