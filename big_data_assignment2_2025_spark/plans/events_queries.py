"""Declared queries over the ``events`` table: JSON prop extraction, hourly
tumbling-window aggregation (the batch form of the streaming slice), and
gap-based sessionization via analytic windows.

These exercise the scalar-function surface the reference lacks entirely
(SURVEY.md §2.8 "Not present: date/time, JSON" → §7.4 extension targets).

Timestamp parity note: the parquet ``ts`` column is nanosecond-precision;
Spark truncates to microseconds, DuckDB keeps ns. All oracle-compared
outputs therefore go through second-or-coarser granularity (epoch seconds
as BIGINT) so the ns/µs representation difference can't leak into hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..sources.readers import load_table


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: count + stats of the JSON prop ``$.k`` — JSON parsing
    stays native (get_json_object), no UDF."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("long").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_hourly_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via Spark's ``window()`` — the exact plan the
    streaming slice reuses (streaming/stream.py runs this same aggregation
    incrementally with a watermark)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("hour_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("hour_start", "event_type")
    )


EVENTS_HOURLY_SQL = """
SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour_start,
       event_type, COUNT(*) AS n_events,
       round(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window aggregation: 1-hour windows advancing every 15 min
    (each event contributes to exactly 4 overlapping windows). Spark's
    ``window(ts, dur, slide)`` expands the 4 memberships inside the scan
    projection — no self-join — then one aggregation shuffle.

    Oracle parity: Spark aligns sliding windows to the epoch on the slide
    grid, so membership is window starts ``floor(t/900)*900 - k*900`` for
    k=0..3; the DuckDB twin generates the same 4 rows per event via
    ``range(4)``. Window bounds compare on exact event time, but the floored
    epoch second yields identical membership because 900 divides the grid.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


EVENTS_SLIDING_SQL = """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 900 * 900) - k.k * 900 AS window_start,
       COUNT(*) AS n_events,
       round(SUM(value), 4) AS sum_value
FROM events CROSS JOIN (SELECT unnest(range(4)) AS k) k
GROUP BY 1
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity closes a session):
    lag → gap flag → running sum = session id, then per-session rollup.
    One shuffle on user_id; the window and the groupBy share it."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    by_user = W.partitionBy("user_id").orderBy("sec", "event_id")
    sess = (
        ev.select("user_id", "event_id", "value", sec.alias("sec"))
        .withColumn("prev_sec", F.lag("sec").over(by_user))
        .withColumn(
            "new_sess",
            F.when(
                F.col("prev_sec").isNull()
                | (F.col("sec") - F.col("prev_sec") > 1800),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("session_id", F.sum("new_sess").over(by_user))
    )
    # no final orderBy: it would add a rangepartitioning exchange + global
    # sort over the full session table for presentation only (the gate's
    # comparison is order-insensitive)
    return sess.groupBy("user_id", "session_id").agg(
        F.min("sec").alias("session_start"),
        F.max("sec").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


EVENTS_SESSIONIZE_SQL = """
WITH e AS (
  SELECT user_id, event_id, value,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec, ts
  FROM events),
lagged AS (
  SELECT *, LAG(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id) AS prev_sec
  FROM e),
flagged AS (
  SELECT *, CASE WHEN prev_sec IS NULL OR sec - prev_sec > 1800
                 THEN 1 ELSE 0 END AS new_sess
  FROM lagged),
sess AS (
  SELECT *, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY sec, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
       MIN(sec) AS session_start, MAX(sec) AS session_end,
       COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def events_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 users by event volume with per-type pivots — the profiling
    query for a behavioral stream."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.min(F.col("ts").cast("long")).alias("first_seen"),
            F.max(F.col("ts").cast("long")).alias("last_seen"),
        )
        .orderBy(F.col("n_events").desc(), F.col("user_id").asc())
        .limit(20)
    )


EVENTS_USER_ACTIVITY_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       COUNT(DISTINCT event_type) AS n_types,
       round(SUM(value), 4) AS total_value,
       MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS first_seen,
       MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS last_seen
FROM events
GROUP BY user_id
ORDER BY n_events DESC, user_id ASC
LIMIT 20
"""


def events_skewed_type_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the 5-value event_type key — the
    skew-mitigation shape for low-cardinality keys at scale (every partition
    contributes a partial per (key, salt) before the 5-row final combine)."""
    from ..operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return salted_agg(
        ev,
        ["event_type"],
        [
            F.count("*").alias("pc"),
            F.sum("value").alias("ps"),
            F.max("value").alias("pm"),
        ],
        [
            F.sum("pc").alias("n_events"),
            F.round(F.sum("ps"), 4).alias("total_value"),
            F.max("pm").alias("max_value"),
        ],
    )


EVENTS_SKEWED_AGG_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       round(SUM(value), 4) AS total_value,
       MAX(value) AS max_value
FROM events GROUP BY event_type
"""


def events_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: a different keep-rate per
    event_type (keep all errors and purchases-heavy, downsample the
    high-volume click/view strata) — the class-rebalancing step of an
    event-training pipeline.

    Like split_train_test, membership hashes the stable event_id (md5 first
    4 hex chars -> 16-bit bucket), NOT rand()/sampleBy(seed): the sample is
    identical across engines, re-runs, and re-partitioning. Pure projection
    + filter, no shuffle, pushdown-friendly.
    """
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    rate = (
        F.when(F.col("event_type") == "error", 1.0)
        .when(F.col("event_type") == "purchase", 0.5)
        .when(F.col("event_type") == "signup", 0.25)
        .otherwise(0.1)  # click / view: high-volume strata
    )
    return (
        ev.withColumn("bucket", bucket)
        .where(F.col("bucket") < rate * 65536)
        .select("event_id", "event_type", "user_id")
    )


EVENTS_STRATIFIED_SAMPLE_SQL = """
SELECT event_id, event_type, user_id
FROM (
  SELECT event_id, event_type, user_id,
         CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 4) AS BIGINT)
           AS bucket,
         CASE event_type WHEN 'error' THEN 1.0 WHEN 'purchase' THEN 0.5
              WHEN 'signup' THEN 0.25 ELSE 0.1 END AS rate
  FROM events)
WHERE bucket < rate * 65536
"""


def events_user_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-score normalization of event values via ``applyInPandas``
    (grouped-map Pandas UDF) — the API surface for per-group Python logic
    that built-in expressions can't cover (here they could — a window AVG/
    STDDEV does it — which is exactly why this one is oracle-checkable; use
    this shape when the per-group step is a real Python library call).

    Cross-engine float determinism: pandas' pairwise summation orders float
    adds differently from SQL engines, so mean/std are computed from EXACT
    integer sums of cent-scaled values (2-decimal inputs -> int64 cents;
    Σc and Σc² are exact), then converted to float with the identical
    operation sequence on both engines — bit-identical results, no rounding
    slack needed (rounded to 6 anyway for belt-and-braces).

    Scale: applyInPandas shuffles on user_id once; each group is a single
    Arrow batch in worker memory — fine for per-user event counts, and the
    same plan holds on 1000 executors.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        c = (pdf["value"] * 100).round().astype("int64")
        n = len(c)
        if n < 2:
            return pdf.iloc[0:0][["user_id", "event_id"]].assign(zscore=0.0)
        s = int(c.sum())
        s2 = int((c * c).sum())
        var = (n * s2 - s * s) / (10000.0 * n * (n - 1))
        if var <= 0.0:
            return pdf.iloc[0:0][["user_id", "event_id"]].assign(zscore=0.0)
        mean = s / (100.0 * n)
        std = var ** 0.5
        z = ((c / 100.0 - mean) / std).round(6)
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "zscore": z}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="user_id long, event_id long, zscore double"
    )


EVENTS_USER_ZSCORE_SQL = """
WITH c AS (
  SELECT user_id, event_id, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
agg AS (
  SELECT user_id, COUNT(*) AS n, SUM(cents) AS s, SUM(cents * cents) AS s2
  FROM c GROUP BY user_id),
z AS (
  SELECT c.user_id, c.event_id,
         (c.cents / 100.0 - s / (100.0 * n))
           / sqrt((n * s2 - s * s) / (10000.0 * n * (n - 1))) AS zraw,
         n, (n * s2 - s * s) / (10000.0 * n * (n - 1)) AS var
  FROM c JOIN agg ON c.user_id = agg.user_id)
SELECT user_id, event_id, round(zraw, 6) AS zscore
FROM z WHERE n >= 2 AND var > 0.0
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: view -> click (after the first view) -> purchase
    (after that click), per user; output is the user count surviving each
    step. The step dependency (each stage's window starts at the previous
    stage's first qualifying event) is expressed as a chain of conditional
    min-aggregations; every join key is user_id, so the three stages reuse
    one hash partitioning — at scale this is 1 logical shuffle profile, not
    3 independent ones. Timestamps compare as exact epoch-µs integers."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        (F.unix_micros(F.col("ts"))).alias("us"),
    )
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    return (
        v.agg(F.count("*").alias("n_view"))
        .crossJoin(c.agg(F.count("*").alias("n_view_click")))
        .crossJoin(p.agg(F.count("*").alias("n_view_click_purchase")))
    )


EVENTS_FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
v AS (SELECT user_id, MIN(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(us) AS t2
      FROM e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.us > v.t1 GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(us) AS t3
      FROM e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.us > c.t2 GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_view_click_purchase
"""


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted in
    each subsequent activity week (offset in weeks). Two aggregations on
    user_id + one on the small (cohort, offset) key; all integer epoch-week
    arithmetic, the canonical product-analytics rollup."""
    # `div`, not `/`: Spark's / is float division and a double quotient can
    # truncate to week-1 vs DuckDB's exact integer //
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr("CAST(floor(CAST(ts AS DOUBLE)) AS BIGINT) div 604800").alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_RETENTION_SQL = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
  FROM events),
f AS (SELECT user_id, MIN(week) AS cohort_week FROM e GROUP BY user_id),
a AS (SELECT DISTINCT user_id, week FROM e)
SELECT cohort_week, week - cohort_week AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY cohort_week, week_offset
ORDER BY cohort_week, week_offset
"""


def events_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per user, build a map event_type -> count
    (map_from_entries over collected structs — key set is unique per group,
    so the map is deterministic), then extract scalars with element_at /
    size. The ORACLE computes the same RESULT relationally (filtered counts,
    NULLIF to mirror element_at's missing-key NULL) — mechanism differs,
    results must not. Final output is all-scalar so the gate's value hash
    never sees engine-specific map renderings."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("type_counts")
    )
    return m.select(
        "user_id",
        F.element_at("type_counts", "click").alias("n_clicks"),
        F.element_at("type_counts", "purchase").alias("n_purchases"),
        F.size("type_counts").alias("n_types"),
    )


EVENTS_MAP_SQL = """
SELECT user_id,
       NULLIF(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS n_clicks,
       NULLIF(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS n_purchases,
       CAST(COUNT(DISTINCT event_type) AS INTEGER) AS n_types
FROM events
GROUP BY user_id
"""


def events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log compaction via min_by/max_by: the first and latest value per
    (user, event_type) in ONE aggregation — the \"upsert log -> current
    state\" collapse, without the window+filter two-step (no second pass,
    map-side combinable, the shape that compacts a CDC stream at scale).

    The ordering key packs (second, event_id) into one bigint so first/last
    are total-ordered and engine-independent; 1.7e9 * 1e7 stays well under
    int64."""
    ev = load_table(spark, sf_dir, "events")
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    ord_key = sec * F.lit(10_000_000).cast("long") + F.col("event_id")
    return (
        ev.select(
            "user_id",
            "event_type",
            F.round("value", 4).alias("value"),
            ord_key.alias("ord"),
            sec.alias("sec"),
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.expr("min_by(value, ord)").alias("first_value"),
            F.expr("max_by(value, ord)").alias("last_value"),
            F.max("sec").alias("last_sec"),
        )
    )


EVENTS_LATEST_STATE_SQL = """
WITH e AS (
  SELECT user_id, event_type, round(value, 4) AS value,
         CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS ord,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec
  FROM events)
SELECT user_id, event_type, COUNT(*) AS n_events,
       min_by(value, ord) AS first_value,
       max_by(value, ord) AS last_value,
       MAX(sec) AS last_sec
FROM e
GROUP BY user_id, event_type
"""


def events_robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust location/scale per event_type: median and MAD (median absolute
    deviation) — outlier-resistant profiling. Two aggregation passes with a
    broadcast of the 5-row medians between them; exact interpolated
    percentile (Spark ``percentile`` == DuckDB ``quantile_cont``) keeps it
    cross-engine deterministic where mean/stddev would drift."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type", "med")
        .agg(
            F.round(
                F.expr("percentile(abs(value - med), 0.5)"), 4
            ).alias("mad_value"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            F.round("med", 4).alias("median_value"),
            "mad_value",
            "n_events",
        )
        .orderBy("event_type")
    )


EVENTS_ROBUST_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type)
SELECT e.event_type,
       round(m.med, 4) AS median_value,
       round(quantile_cont(abs(e.value - m.med), 0.5), 4) AS mad_value,
       COUNT(*) AS n_events
FROM events e JOIN med m ON e.event_type = m.event_type
GROUP BY e.event_type, m.med
ORDER BY e.event_type
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of event values — the profiling primitive
    behind every data-quality dashboard. Bin edges derive from the global
    min/max (one tiny aggregate, broadcast back); bin assignment is a pure
    projection, so the whole thing is two map-side-combinable aggregations.
    The bin formula runs the identical IEEE sequence on both engines."""
    ev = load_table(spark, sf_dir, "events").select("value")
    rng = ev.agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor(
                (F.col("value") - F.col("vmin")) * 20.0
                / (F.col("vmax") - F.col("vmin"))
            ),
            F.lit(19),
        )
        .cast("long")
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count("*").alias("n_events")).orderBy("bin")


EVENTS_HISTOGRAM_SQL = """
WITH rng AS (SELECT MIN(value) AS vmin, MAX(value) AS vmax FROM events)
SELECT CAST(LEAST(FLOOR((value - vmin) * 20.0 / (vmax - vmin)), 19) AS BIGINT) AS bin,
       COUNT(*) AS n_events
FROM events CROSS JOIN rng
GROUP BY 1 ORDER BY 1
"""


QUERIES = {
    "events_funnel": events_funnel,
    "events_latest_state": events_latest_state,
    "events_map_funcs": events_map_funcs,
    "events_retention_cohorts": events_retention_cohorts,
    "events_robust_stats": events_robust_stats,
    "events_value_histogram": events_value_histogram,
    "events_stratified_sample": events_stratified_sample,
    "events_user_zscore": events_user_zscore,
    "events_sliding_window": events_sliding_window,
    "events_json_extract": events_json_extract,
    "events_skewed_type_agg": events_skewed_type_agg,
    "events_hourly_window": events_hourly_window,
    "events_sessionize": events_sessionize,
    "events_user_activity": events_user_activity,
}

ORACLES = {
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_latest_state": EVENTS_LATEST_STATE_SQL,
    "events_map_funcs": EVENTS_MAP_SQL,
    "events_retention_cohorts": EVENTS_RETENTION_SQL,
    "events_robust_stats": EVENTS_ROBUST_SQL,
    "events_value_histogram": EVENTS_HISTOGRAM_SQL,
    "events_stratified_sample": EVENTS_STRATIFIED_SAMPLE_SQL,
    "events_user_zscore": EVENTS_USER_ZSCORE_SQL,
    "events_sliding_window": EVENTS_SLIDING_SQL,
    "events_json_extract": EVENTS_JSON_SQL,
    "events_skewed_type_agg": EVENTS_SKEWED_AGG_SQL,
    "events_hourly_window": EVENTS_HOURLY_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_user_activity": EVENTS_USER_ACTIVITY_SQL,
}
