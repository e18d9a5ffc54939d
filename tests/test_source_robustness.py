"""Source robustness surfaces: malformed-record handling modes on schema'd
JSON reads (the 100 TB reality: some fraction of any ingest is garbage and
the pipeline must choose capture/drop/fail explicitly, not crash or
silently corrupt) and on-disk compression codecs round-tripping losslessly.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType


@pytest.fixture(scope="module")
def jsonl_with_garbage(tmp_path_factory):
    d = tmp_path_factory.mktemp("garbage")
    p = os.path.join(str(d), "rows.jsonl")
    with open(p, "w") as fh:
        fh.write('{"id": 1, "name": "ok-1"}\n')
        fh.write("{this is not json at all\n")
        fh.write('{"id": 3, "name": "ok-3"}\n')
    return p


_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("_corrupt_record", StringType()),
    ]
)


def test_permissive_mode_captures_corrupt_record(spark, jsonl_with_garbage):
    df = (
        spark.read.schema(_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(jsonl_with_garbage)
    )
    rows = df.collect()
    assert len(rows) == 3
    good = {r["id"]: r["name"] for r in rows if r["_corrupt_record"] is None}
    assert good == {1: "ok-1", 3: "ok-3"}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and bad[0]["id"] is None
    assert "not json" in bad[0]["_corrupt_record"]


def test_dropmalformed_mode_drops_garbage(spark, jsonl_with_garbage):
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "DROPMALFORMED")
        .json(jsonl_with_garbage)
    )
    assert {r["id"] for r in df.collect()} == {1, 3}


def test_failfast_mode_raises(spark, jsonl_with_garbage):
    schema = StructType(
        [StructField("id", LongType()), StructField("name", StringType())]
    )
    with pytest.raises(Exception) as exc:
        (
            spark.read.schema(schema)
            .option("mode", "FAILFAST")
            .json(jsonl_with_garbage)
            .collect()
        )
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


@pytest.mark.parametrize("codec", ["snappy", "zstd", "gzip", "lz4"])
def test_parquet_compression_codecs_roundtrip(spark, tmp_path, codec):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.md5(F.col("id").cast("string")).alias("s")
    )
    path = str(tmp_path / f"c_{codec}")
    df.write.option("compression", codec).parquet(path)

    import pyarrow.parquet as pq

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert files
    md = pq.ParquetFile(os.path.join(path, files[0])).metadata
    codecs = {
        md.row_group(rg).column(c).compression.lower()
        for rg in range(md.num_row_groups)
        for c in range(md.num_columns)
    }
    if codec == "lz4":
        # Spark writes the Hadoop LZ4 framing, which pyarrow's metadata
        # reader reports as unknown; the Spark-side roundtrip below is the
        # real check for this codec
        assert codecs <= {"lz4", "lz4_raw", "unknown"}
    else:
        assert codecs == {codec.lower()}

    back = spark.read.parquet(path)
    assert back.count() == 1000
    assert back.agg(F.sum("id")).first()[0] == 999 * 1000 // 2


def test_dynamic_partition_overwrite_backfill(spark, tmp_path):
    # backfill reality: rewriting ONE day must not clobber the others.
    # static overwrite mode drops every partition; dynamic replaces only
    # the partitions present in the incoming frame
    path = str(tmp_path / "byday")
    days = spark.createDataFrame(
        [(d, v) for d, v in [("d1", 1), ("d2", 2), ("d3", 3)]], "day string, v long"
    )
    days.write.partitionBy("day").parquet(path)

    fixed_d2 = spark.createDataFrame([("d2", 20)], "day string, v long")
    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        fixed_d2.write.mode("overwrite").partitionBy("day").parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)

    back = {r["day"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert back == {"d1": 1, "d2": 20, "d3": 3}


def test_parquet_schema_evolution_mergeschema(spark, tmp_path):
    # additive column evolution: old files lack the new column; a
    # mergeSchema read unions the schemas and fills NULLs for old rows
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(
        path
    )
    spark.createDataFrame(
        [(2, "b", "en")], "id long, name string, lang string"
    ).write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"id", "name", "lang"}
    rows = {r["id"]: (r["name"], r["lang"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", "en")}
