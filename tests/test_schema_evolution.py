"""Snapshot-store schema evolution: additive add-column, per-version
manifest schemas, NULL backfill of pre-evolution members, and the merge /
compaction / diff / pruned-read behaviors across mixed-schema members.

Contracts mirrored from the public table formats (Delta ALTER TABLE ADD
COLUMN / write-time mergeSchema; Iceberg per-snapshot schemas):
- evolution is ADDITIVE only; type changes are rejected loudly;
- a pre-evolution member reads with the new column as NULL;
- time travel to a pre-evolution version reads the OLD schema;
- compaction and merge across mixed-schema members produce
  schema-complete output without touching pinned history.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from big_data_assignment2_2025_spark.sources.snapshots import (
    SnapshotConflictError,
    SnapshotStore,
)


@pytest.fixture()
def store(tmp_path):
    return SnapshotStore(str(tmp_path / "snap"))


def _base(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("v")
    )


def _wide(spark, lo, hi):
    return _base(spark, lo, hi).withColumn("score", F.col("k") * 10)


def _rows(spark, store, version=None):
    df = store.read(spark, version)
    return sorted(tuple(r) for r in df.collect())


def test_evolve_on_append_backfills_null(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    with pytest.raises(ValueError, match="evolve_schema=True"):
        store.commit(_wide(spark, 3, 5), mode="append")
    store.commit(_wide(spark, 3, 5), mode="append", evolve_schema=True)
    got = _rows(spark, store)
    assert got == [
        (0, "0", None),
        (1, "1", None),
        (2, "2", None),
        (3, "3", 30),
        (4, "4", 40),
    ]
    assert store.read(spark).schema["score"].dataType == LongType()


def test_time_travel_reads_pre_evolution_schema(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    store.commit(_wide(spark, 3, 5), mode="append", evolve_schema=True)
    v1 = store.read(spark, 1)
    assert v1.columns == ["k", "v"]  # no retroactive column
    assert store.manifest(1)["schema_version"] == 1
    assert store.manifest(2)["schema_version"] == 2
    assert store.schema(1).fieldNames() == ["k", "v"]
    assert store.schema(2).fieldNames() == ["k", "v", "score"]


def test_add_column_is_schema_only(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    v2 = store.add_column("score", "bigint")
    assert v2 == 2
    doc = store.manifest(2)
    assert doc["mode"] == "alter" and doc["added"] == []
    assert doc["members"] == store.manifest(1)["members"]  # no data written
    got = _rows(spark, store)
    assert got == [(0, "0", None), (1, "1", None), (2, "2", None)]
    # a later append fills it without re-flagging evolution
    store.commit(_wide(spark, 3, 4), mode="append")
    assert (3, "3", 30) in _rows(spark, store)
    assert store.schema().fields[-1].dataType == LongType()


def test_add_column_rejects_duplicates_and_type_changes(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    with pytest.raises(ValueError, match="already exists"):
        store.add_column("v", "string")
    # type change on a shared column is never evolution
    retyped = spark.range(3, 4).select(
        F.col("id").alias("k"), F.col("id").alias("v")  # v: string -> long
    )
    with pytest.raises(ValueError, match="type change on column 'v'"):
        store.commit(retyped, mode="append", evolve_schema=True)


def test_subset_write_backfills_missing_column(spark, store):
    """A batch may write a column SUBSET: readers backfill NULL."""
    store.commit(_wide(spark, 0, 2), mode="overwrite")
    store.commit(_base(spark, 2, 4), mode="append")  # no score column
    got = _rows(spark, store)
    assert got == [(0, "0", 0), (1, "1", 10), (2, "2", None), (3, "3", None)]
    assert store.manifest(2)["schema_version"] == 1  # nothing evolved


def test_compact_across_mixed_schema_members(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    store.commit(_wide(spark, 3, 5), mode="append", evolve_schema=True)
    before = _rows(spark, store)
    v3 = store.compact(spark)
    assert _rows(spark, store, v3) == before  # logical no-op
    # the compacted member is schema-complete: reading it RAW (no manifest
    # schema) still shows the evolved column
    member = store.manifest(v3)["members"][0]
    import os

    raw = spark.read.parquet(os.path.join(store.base_dir, member))
    assert set(raw.columns) == {"k", "v", "score"}
    # pinned pre-evolution version untouched
    assert store.read(spark, 1).columns == ["k", "v"]
    assert store.manifest(v3)["schema_version"] == 2


def test_merge_across_mixed_schema_members(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    store.commit(_wide(spark, 3, 5), mode="append", evolve_schema=True)
    changes = spark.createDataFrame(
        [(0, "ZERO", 100, "upsert"), (3, None, None, "delete"),
         (9, "nine", 90, "upsert")],
        "k long, v string, score long, _op string",
    )
    store.merge(spark, changes, keys=["k"])
    got = _rows(spark, store)
    assert got == [
        (0, "ZERO", 100),
        (1, "1", None),
        (2, "2", None),
        (4, "4", 40),
        (9, "nine", 90),
    ]


def test_merge_with_pre_evolution_changes_batch(spark, store):
    """An old writer's changes batch (no evolved column) still merges:
    the evolved column passes through from the target and stays NULL for
    inserts."""
    store.commit(_wide(spark, 0, 3), mode="overwrite")
    store.add_column("extra", "string")
    changes = spark.createDataFrame(
        [(1, "ONE", "upsert"), (7, "seven", "upsert")],
        "k long, v string, _op string",
    )
    store.merge(spark, changes, keys=["k"])
    got = {
        r["k"]: (r["v"], r["score"], r["extra"])
        for r in store.read(spark).collect()
    }
    assert got == {
        0: ("0", 0, None),
        1: ("ONE", 10, None),  # score passed through the merge
        2: ("2", 20, None),
        7: ("seven", None, None),
    }


def test_pruned_merge_across_mixed_schema_members(spark, store):
    """Pruned merge where the AFFECTED member predates the evolution: the
    rewritten member comes out schema-complete, untouched members keep
    NULL-backfilling through the manifest schema."""
    store.commit(_base(spark, 0, 100), mode="overwrite", stats_cols=["k"])
    store.commit(
        _wide(spark, 100, 200),
        mode="append",
        stats_cols=["k"],
        evolve_schema=True,
    )
    changes = spark.createDataFrame(
        [(5, "FIVE", 55, "upsert")], "k long, v string, score long, _op string"
    )
    v = store.merge(spark, changes, keys=["k"], prune=True)
    doc = store.manifest(v)
    assert doc["mode"] == "merge"
    assert doc["rewrote"] == store.manifest(1)["members"]  # only the old one
    got = store.read(spark).where(F.col("k").isin(5, 6, 150)).collect()
    by_k = {r["k"]: (r["v"], r["score"]) for r in got}
    assert by_k == {5: ("FIVE", 55), 6: ("6", None), 150: ("150", 1500)}


def test_diff_passes_through_alter_and_uses_new_schema(spark, store):
    store.commit(_base(spark, 0, 3), mode="overwrite")
    store.add_column("score", "bigint")
    store.commit(_wide(spark, 3, 5), mode="append")
    d = store.diff(spark, 1, 3)
    assert sorted(tuple(r) for r in d.collect()) == [(3, "3", 30), (4, "4", 40)]
    # pure-alter range: zero rows, evolved schema
    d2 = store.diff(spark, 1, 2)
    assert d2.count() == 0 and d2.columns == ["k", "v", "score"]


def test_read_where_prunes_with_mixed_schema(spark, store):
    store.commit(_base(spark, 0, 100), mode="overwrite", stats_cols=["k"])
    store.commit(
        _wide(spark, 100, 200),
        mode="append",
        stats_cols=["k"],
        evolve_schema=True,
    )
    pruned = store.read_where(spark, "k", 120, 130)
    # only the second member is opened; schema is the evolved one
    m1 = store.manifest(2)["members"][0]
    assert m1 not in "\n".join(pruned.inputFiles())
    rows = sorted((r["k"], r["score"]) for r in pruned.collect())
    assert rows == [(k, k * 10) for k in range(120, 130)]
    # a pre-evolution-member read under the new schema backfills
    old = store.read_where(spark, "k", 5, 7)
    assert sorted((r["k"], r["score"]) for r in old.collect()) == [
        (5, None),
        (6, None),
    ]


def test_add_column_rebases_over_concurrent_append(spark, store):
    """An OCC loser on add_column re-reads the new latest (including its
    member list) and lands one version up — the interleaved append's rows
    are present AND read under the evolved schema."""
    store.commit(_base(spark, 0, 3), mode="overwrite")

    orig = store._publish
    state = {"fired": False}

    def racy(version, doc):
        if not state["fired"]:
            state["fired"] = True
            SnapshotStore(store.base_dir).commit(
                _base(spark, 10, 12), mode="append"
            )
        return orig(version, doc)

    store._publish = racy
    v = store.add_column("score", "bigint")
    assert v == 3
    got = _rows(spark, store)
    assert got == [
        (0, "0", None),
        (1, "1", None),
        (2, "2", None),
        (10, "10", None),
        (11, "11", None),
    ]


def test_legacy_manifest_without_schema_still_reads(spark, store):
    """Manifests written before schema tracking (no "schema" key) read by
    inference; the next commit records the schema going forward."""
    store.commit(_base(spark, 0, 3), mode="overwrite")
    # strip the schema fields to simulate a legacy manifest
    import json

    p = store._manifest_path(1)
    doc = json.load(open(p))
    doc.pop("schema"), doc.pop("schema_version")
    import os

    os.unlink(p)
    with open(p, "w") as fh:
        json.dump(doc, fh)
    assert _rows(spark, store) == [(0, "0"), (1, "1"), (2, "2")]
    with pytest.raises(ValueError, match="schema-tracking manifest"):
        store.add_column("score", "bigint")
    store.commit(_base(spark, 3, 4), mode="append")
    assert store.manifest(2)["schema_version"] == 1
    assert store.schema(2).fieldNames() == ["k", "v"]


def test_string_dtype_parse_matches_datatype(spark, store):
    store.commit(_base(spark, 0, 1), mode="overwrite")
    store.add_column("a", "string")
    store.add_column("b", StringType())
    fields = {f.name: f.dataType for f in store.schema().fields}
    assert fields["a"] == fields["b"] == StringType()
    assert store.manifest(3)["schema_version"] == 3


def test_schema_version_monotone_across_overwrite(spark, store):
    """schema_version is a lineage-level monotone counter (the module
    contract): an overwrite resets members, never the schema history —
    a consumer caching 'schema as of version 3' must never see the
    counter rewind (round-10 review find)."""
    store.commit(_base(spark, 0, 2), mode="overwrite")
    store.add_column("score", "bigint")
    assert store.manifest(2)["schema_version"] == 2
    # same declared schema -> same version, even through overwrite
    v3 = store.commit(store.read(spark, 2), mode="overwrite")
    assert store.manifest(v3)["schema_version"] == 2
    # a different declared schema through overwrite BUMPS, never rewinds
    v4 = store.commit(_base(spark, 0, 2), mode="overwrite")
    assert store.manifest(v4)["schema_version"] == 3
