"""Salted two-phase aggregation must equal the plain one-phase groupBy."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.skew import salted_agg, with_salt


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(500)] + [("b", 1.0), ("c", 2.5)],
        ["k", "v"],
    )
    got = {
        r.k: (r.n, round(r.total, 6), r.mx)
        for r in salted_agg(
            df,
            ["k"],
            [F.count("*").alias("pc"), F.sum("v").alias("ps"), F.max("v").alias("pm")],
            [
                F.sum("pc").alias("n"),
                F.round(F.sum("ps"), 6).alias("total"),
                F.max("pm").alias("mx"),
            ],
            buckets=8,
        ).collect()
    }
    want = {
        r.k: (r.n, round(r.total, 6), r.mx)
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("v"), 6).alias("total"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_salt_spreads_rows(spark):
    df = spark.createDataFrame([("hot", float(i)) for i in range(1000)], ["k", "v"])
    n_buckets = with_salt(df, buckets=16).select("_salt").distinct().count()
    assert n_buckets > 8  # a single hot key fans out over most salt buckets
