"""Skew-mitigation primitives.

AQE's skew-join splitting handles *join* skew at runtime; aggregation skew
on low-cardinality keys (the ``events.event_type`` column has 5 values — at
100 TB that is 5 reducers doing all the work no matter how many executors
exist) needs the classic **salted two-phase aggregate**: group on
(key, salt) first so every partition contributes, then combine the partial
results per key. Algebraic aggregates (count/sum/min/max) compose exactly;
avg is carried as (sum, count).

``salted_agg`` is the generic form used by the declared query; the salt
column never leaves the first phase.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 32, col_name: str = "_salt") -> DataFrame:
    """Uniform pseudo-random salt derived from a full-row hash — cheap,
    deterministic per row content, no RNG state."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation over skewed ``keys``.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` combine the partial
    columns per key. Caller aligns the alias names between phases, e.g.::

        salted_agg(ev, ["event_type"],
                   [F.count("*").alias("pc"), F.sum("value").alias("ps")],
                   [F.sum("pc").alias("n"), F.sum("ps").alias("total")])
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
