"""The grading driver builds its OWN SparkSession — none of get_spark's
confs (UTC timezone, AQE, nanosAsLong) can be assumed. The readers repair
the session-scoped confs they depend on at load time; these tests prove it
by sabotaging the session the way a foreign driver could and checking that
timestamp-bearing queries still produce the oracle-exact answers."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.plans import ORACLES, QUERIES


def _duck_rows(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cols = [d[0] for d in con.execute(sql).description]
    # repr-keyed sort: NULLs (ROLLUP totals) defeat tuple ordering
    return cols, sorted(map(tuple, con.execute(sql).fetchall()), key=repr)


@pytest.mark.parametrize(
    "name", ["events_dow_hour_heatmap", "interval_merge_coverage"]
)
def test_events_queries_survive_non_utc_session(spark, sf_dir, name):
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        got = sorted(map(tuple, QUERIES[name](spark, sf_dir).collect()), key=repr)
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
    _, want = _duck_rows(sf_dir, ORACLES[name])
    assert got == want


@pytest.mark.parametrize(
    "name", ["orders_quarter_rollup", "orders_daily_gapfill", "date_funcs"]
)
def test_orders_date_queries_survive_foreign_session(spark, sf_dir, name):
    """A foreign driver may disable NTZ inference AND run in a non-UTC zone;
    o_orderdate would then load as a tz-adjusted TIMESTAMP and every date
    readout would shift. load_table pins both confs on every load."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    old_ntz = spark.conf.get("spark.sql.parquet.inferTimestampNTZ", None)
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ", "false")
    try:
        rows = list(map(tuple, QUERIES[name](spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
        if old_ntz is None:
            spark.conf.unset("spark.sql.parquet.inferTimestampNTZ")
        else:
            spark.conf.set("spark.sql.parquet.inferTimestampNTZ", old_ntz)
    got = sorted(rows, key=repr)
    _, want = _duck_rows(sf_dir, ORACLES[name])
    assert got == want


def test_load_table_normalizes_ts_type(spark, sf_dir):
    from big_data_assignment2_2025_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # µs epoch arithmetic must be available (would fail on NTZ/bigint)
    assert ev.select(F.unix_micros("ts")).first()[0] is not None
