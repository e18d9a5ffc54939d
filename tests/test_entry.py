"""Smoke test of the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert [f.name for f in df.schema.fields] == ["doc_id", "doc_title", "doc_rank"]


def test_registry_shape(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert qs, "registry must not be empty"
    for name in oracles:
        assert name in qs, f"oracle {name} has no query"
