"""Avro gating: the external spark-avro jar is absent in this container, so
the capability probe must say so and the read/write paths must fail fast
with an actionable message. If a future environment carries the jar, the
same test flips to exercising a real roundtrip — no code change needed."""

from __future__ import annotations

import pytest

from big_data_assignment2_2025_spark.sources.avro import (
    avro_available,
    read_avro,
    write_avro,
)


def test_avro_probe_is_boolean_and_stable(spark):
    first = avro_available(spark)
    assert isinstance(first, bool)
    assert avro_available(spark) == first


def test_avro_gating_or_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    path = str(tmp_path / "avro_ds")
    if avro_available(spark):
        write_avro(df, path)
        got = read_avro(spark, path)
        assert sorted(r.id for r in got.collect()) == [1, 2]
    else:
        with pytest.raises(RuntimeError, match="spark-avro"):
            write_avro(df, path)
        with pytest.raises(RuntimeError, match="spark.jars.packages"):
            read_avro(spark, path)
