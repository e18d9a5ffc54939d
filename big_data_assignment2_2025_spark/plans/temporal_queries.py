"""Declared queries for the temporal join operators (operators/temporal.py).

The as-of oracle uses DuckDB's native ``ASOF JOIN`` — an independent
implementation of the same semantics, which is exactly what makes it a good
differential test for our union+last_value formulation.

All times go through integer epoch seconds (see events_queries timestamp
parity note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, range_join_banded
from ..sources.readers import load_table


def _events_sec(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.col("ts").cast("long").alias("sec"),
    )


def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click event: the user's most recent purchase value at or
    before the click. Right side pre-aggregated to one row per (user, sec)
    so the as-of match is well-defined."""
    ev = _events_sec(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "sec", "event_id"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "sec")
        .agg(F.round(F.max("value"), 4).alias("purchase_value"))
    )
    out = asof_join(
        clicks, purchases, on="user_id", time_col="sec",
        right_cols=["purchase_value"],
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("sec").alias("click_sec"),
        F.col("purchase_value_asof").alias("last_purchase_value"),
    )


ASOF_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
clicks AS (SELECT user_id, sec, event_id FROM e WHERE event_type = 'click'),
purch AS (
  SELECT user_id, sec, round(MAX(value), 4) AS purchase_value
  FROM e WHERE event_type = 'purchase' GROUP BY user_id, sec)
SELECT c.user_id, c.event_id, c.sec AS click_sec,
       p.purchase_value AS last_purchase_value
FROM clicks c
ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.sec >= p.sec
"""


def asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: for every click, the time of the user's NEXT purchase
    at or after the click (NULL when none follows). Same one-shuffle
    carry-forward plan as the backward variant, scanned over descending
    time. Oracle via DuckDB ASOF JOIN with a <= condition."""
    ev = _events_sec(spark, sf_dir)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "sec", "event_id"
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "sec")
        .distinct()
        .withColumn("purchase_sec", F.col("sec"))
    )
    out = asof_join(
        clicks, purchases, on="user_id", time_col="sec",
        right_cols=["purchase_sec"], direction="forward",
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("sec").alias("click_sec"),
        F.col("purchase_sec_asof").alias("next_purchase_sec"),
    )


ASOF_FORWARD_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events),
clicks AS (SELECT user_id, sec, event_id FROM e WHERE event_type = 'click'),
purch AS (
  SELECT DISTINCT user_id, sec, sec AS purchase_sec
  FROM e WHERE event_type = 'purchase')
SELECT c.user_id, c.event_id, c.sec AS click_sec,
       p.purchase_sec AS next_purchase_sec
FROM clicks c
ASOF LEFT JOIN purch p
  ON c.user_id = p.user_id AND c.sec <= p.sec
"""


def range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(error, click) pairs for the same user with the click 0-600 s after
    the error — the banded equi-join form of an interval theta-join."""
    ev = _events_sec(spark, sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "sec", F.col("event_id").alias("error_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "sec", F.col("event_id").alias("click_id")
    )
    out = range_join_banded(
        errors, clicks, on="user_id", time_col="sec", lower=0, upper=600, band=600
    )
    return out.select(
        "user_id",
        F.col("error_id_l").alias("error_id"),
        F.col("click_id_r").alias("click_id"),
        (F.col("r_time") - F.col("l_time")).alias("gap_sec"),
    )


RANGE_JOIN_SQL = """
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events)
SELECT a.user_id, a.event_id AS error_id, b.event_id AS click_id,
       b.sec - a.sec AS gap_sec
FROM e a JOIN e b
  ON a.user_id = b.user_id
 AND a.event_type = 'error' AND b.event_type = 'click'
 AND b.sec - a.sec BETWEEN 0 AND 600
"""


QUERIES = {
    "asof_last_purchase": asof_last_purchase,
    "asof_next_purchase": asof_next_purchase,
    "range_join_error_clicks": range_join_error_clicks,
}

ORACLES = {
    "asof_last_purchase": ASOF_SQL,
    "asof_next_purchase": ASOF_FORWARD_SQL,
    "range_join_error_clicks": RANGE_JOIN_SQL,
}
