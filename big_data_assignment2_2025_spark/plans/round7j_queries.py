"""Round-7j queries: sequence models, robust statistics, time-weighting,
interval algebra, and warehouse history.

- **Markov transitions** (``events_markov_transitions``): the first-order
  event-type transition matrix — for each (current, next) event-type
  pair over per-user time-ordered streams, the pair count and the
  conditional probability P(next|current). The next-event-prediction /
  clickstream-model primitive. The cell frame is bounded (|event
  types|²), so the one float chain per cell runs on a fixed-size frame.
- **daily autocorrelation** (``events_acf_daily``): lag-1..7
  autocorrelation of the daily value series — the seasonality detector
  (a weekly cycle shows as an ACF spike at lag 7). Centered cross
  products are kept EXACT by n-scaling (dev_t = n·v_t − total, a
  BIGINT; products/sums carried in DECIMAL(38,0) on Spark and HUGEINT
  on DuckDB — both exact integer arithmetic), so each ACF cell is one
  frozen double division over two exactly-computed integers.
- **median/MAD robust anomaly** (``events_mad_anomaly``): the robust
  twin of the EWMA control chart — flag days where |v − median| exceeds
  3·1.4826·MAD. Median and MAD are LOWER medians picked by integer rank
  (row_number at ceil(n/2) with a deterministic (value, day) tie-break),
  and the threshold compare is pure integer algebra (10000·dev >
  44478·mad), so the whole query has ZERO float ops.
- **time-weighted average** (``events_twap_daily``): per-day TWAP of the
  value series — each observation weighted by the microseconds until
  the next observation (last one runs to midnight). The
  irregular-sampling average (a sensor that reports rarely when idle
  must not be averaged per-sample). Products v_4dp·dur_µs stay within
  BIGINT by construction (per-day durations sum to ≤86.4e9 µs), one
  frozen division per day cell.
- **interval merge** (``events_interval_merge``): per-user union of
  overlapping activity intervals [ts, ts+5min) — the gaps-and-islands
  coverage primitive (total distinct active time, number of activity
  bursts). Classic cumulative-max island detection; exact epoch-µs
  integers throughout.
- **SCD Type-2 history** (``orders_scd2_history``): the slowly-changing-
  dimension build — collapse each customer's order-status stream into
  versioned [valid_from, valid_to) rows with an is_current flag, run
  detection via lag≠current + cumulative sum, deterministic
  (o_orderdate, o_orderkey) ordering. The warehouse-history companion
  to merge_upsert/snapshot_diff/latest_state.

No reference counterpart; analytics extensions per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

#: integer scale for value ten-thousandths
_SCALE = 10_000

# --------------------------------------------------------------------------
# 1. Markov transition matrix
# --------------------------------------------------------------------------


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over per-user event-type streams:
    pair counts and P(next|current) in micro-units. The per-user lead
    runs user-partitioned (parallel at any scale); the probability math
    runs on the bounded |types|² cell frame after two hash
    aggregations."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            "user_id",
            "event_type",
            F.lead("event_type").over(w).alias("next_type"),
        )
        .where(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(
        F.count("*").cast("long").alias("n_pair")
    )
    froms = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_from")
    )
    return (
        counts.join(F.broadcast(froms), "event_type")
        .select(
            "event_type",
            "next_type",
            "n_pair",
            "n_from",
            F.expr(
                "CAST(floor(CAST(n_pair AS DOUBLE) * 1000000 / n_from + 0.5)"
                " AS BIGINT)"
            ).alias("p_micros"),
        )
        .orderBy("event_type", "next_type")
    )


MARKOV_SQL = """
WITH pairs AS (
  SELECT event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events WHERE user_id IS NOT NULL
),
valid AS (SELECT * FROM pairs WHERE next_type IS NOT NULL),
counts AS (
  SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n_pair
  FROM valid GROUP BY 1, 2
),
froms AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_from
  FROM valid GROUP BY 1
)
SELECT c.event_type, c.next_type, c.n_pair, f.n_from,
       CAST(floor(CAST(c.n_pair AS DOUBLE) * 1000000 / f.n_from + 0.5)
            AS BIGINT) AS p_micros
FROM counts c JOIN froms f ON f.event_type = c.event_type
ORDER BY c.event_type, c.next_type
"""


# --------------------------------------------------------------------------
# 2. Daily autocorrelation (lags 1..7)
# --------------------------------------------------------------------------

#: maximum autocorrelation lag
_ACF_MAX_LAG = 7


def _acf_daily_sql(int128_cast: str) -> str:
    """The whole ACF query as one SQL text, parameterized ONLY by the
    exact-int128 cast type (``DECIMAL(38,0)`` on Spark, ``HUGEINT`` on
    DuckDB — both exact integer arithmetic for the centered cross
    products, which exceed int64). dev_t = n·v_t − total is itself
    BIGINT-safe; the final per-lag cell is one frozen double division."""
    lead_cols = ",\n         ".join(
        f"LEAD(dev, {k}) OVER (ORDER BY day) AS dev{k}"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    num_cols = ",\n         ".join(
        f"SUM(dev * dev{k}) AS num{k}" for k in range(1, _ACF_MAX_LAG + 1)
    )
    cells = "\n  UNION ALL\n".join(
        f"  SELECT {k} AS lag_k, num{k} AS num, den, n FROM agg"
        for k in range(1, _ACF_MAX_LAG + 1)
    )
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(floor(round(value, 4) * {_SCALE} + 0.5) AS BIGINT)) AS v_us
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
devs AS (
  SELECT day,
         CAST(COUNT(*) OVER () * v_us - SUM(v_us) OVER ()
              AS {int128_cast}) AS dev,
         COUNT(*) OVER () AS n
  FROM daily
),
led AS (
  SELECT dev, n,
         {lead_cols}
  FROM devs
),
agg AS (
  SELECT {num_cols},
         SUM(dev * dev) AS den,
         MAX(n) AS n
  FROM led
),
cells AS (
{cells}
)
SELECT CAST(lag_k AS INTEGER) AS lag_k,
       CAST(n - lag_k AS BIGINT) AS n_pairs,
       CASE WHEN den = 0 OR num IS NULL THEN NULL
            ELSE CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                            * 1000000 + 0.5) AS BIGINT)
       END AS acf_micros
FROM cells
ORDER BY lag_k
"""


def events_acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily value series; one SQL text
    (exec'd through ``spark.sql``) shared with the DuckDB oracle modulo
    the int128 cast spelling. The windows run on the calendar-bounded
    daily aggregate — the deliberate bounded-single-task tail every
    time-series query here shares."""
    for t in ("events",):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_acf_daily_sql("DECIMAL(38,0)"))


# --------------------------------------------------------------------------
# 3. Median/MAD robust anomaly
# --------------------------------------------------------------------------

#: 10000·3·1.4826 — the integerized 3-sigma-equivalent MAD multiplier
_MAD_K10K = 44_478


def events_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier days: |v − median| > 3·1.4826·MAD, with median and
    MAD as LOWER medians picked by integer rank (deterministic
    (value, day) tie-break) and the threshold compare in pure integer
    algebra — the query has zero float ops anywhere."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.expr(f"CAST(floor(round(value, 4) * {_SCALE} + 0.5) AS BIGINT)")
        ).alias("v_us")
    )
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = daily.select(
        "day",
        "v_us",
        F.row_number().over(Window.orderBy("v_us", "day")).alias("rn"),
        F.count("*").over(w_all).alias("n"),
    )
    with_med = ranked.select(
        "day",
        "v_us",
        F.max(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v_us"))
        )
        .over(w_all)
        .alias("med_us"),
    )
    devs = with_med.select(
        "day", "v_us", "med_us", F.abs(F.col("v_us") - F.col("med_us")).alias("dev_us")
    )
    dev_ranked = devs.select(
        "*",
        F.row_number().over(Window.orderBy("dev_us", "day")).alias("drn"),
        F.count("*").over(w_all).alias("n"),
    )
    with_mad = dev_ranked.select(
        "day",
        "v_us",
        "med_us",
        "dev_us",
        F.max(
            F.when(F.col("drn") == F.expr("(n + 1) div 2"), F.col("dev_us"))
        )
        .over(w_all)
        .alias("mad_us"),
    )
    return (
        with_mad.select(
            "day",
            "v_us",
            "med_us",
            "mad_us",
            F.when(
                F.col("dev_us") * F.lit(10_000).cast("long")
                > F.lit(_MAD_K10K).cast("long") * F.col("mad_us"),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("is_anomaly"),
        )
        .orderBy("day")
    )


MAD_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(floor(round(value, 4) * {_SCALE} + 0.5) AS BIGINT)) AS v_us
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT day, v_us,
         ROW_NUMBER() OVER (ORDER BY v_us, day) AS rn,
         COUNT(*) OVER () AS n
  FROM daily
),
with_med AS (
  SELECT day, v_us,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN v_us END) OVER () AS med_us
  FROM ranked
),
devs AS (
  SELECT day, v_us, med_us, abs(v_us - med_us) AS dev_us FROM with_med
),
dev_ranked AS (
  SELECT day, v_us, med_us, dev_us,
         ROW_NUMBER() OVER (ORDER BY dev_us, day) AS drn,
         COUNT(*) OVER () AS n
  FROM devs
),
with_mad AS (
  SELECT day, v_us, med_us, dev_us,
         MAX(CASE WHEN drn = (n + 1) // 2 THEN dev_us END) OVER () AS mad_us
  FROM dev_ranked
)
SELECT day, CAST(v_us AS BIGINT) AS v_us, CAST(med_us AS BIGINT) AS med_us,
       CAST(mad_us AS BIGINT) AS mad_us,
       CAST(CASE WHEN dev_us * 10000 > {_MAD_K10K} * mad_us
                 THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
FROM with_mad
ORDER BY day
"""


# --------------------------------------------------------------------------
# 4. Time-weighted average (TWAP) per day
# --------------------------------------------------------------------------


def _twap_sql(epoch_us: str, next_midnight: str) -> str:
    """Parameterized only by the engines' epoch-µs and next-midnight
    spellings. Weight = µs until the next same-day observation (the last
    observation runs to midnight); per-day Σdur is ≤86.4e9 µs by
    construction, so Σ(v_4dp·dur) ≤ 5.6e17 stays in BIGINT."""
    return f"""
WITH obs AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(floor(round(value, 4) * {_SCALE} + 0.5) AS BIGINT) AS v4,
         {epoch_us.format(col="ts")} AS t_us,
         COALESCE(
           {epoch_us.format(
               col=("LEAD(ts) OVER (PARTITION BY CAST(ts AS DATE)"
                    " ORDER BY ts, event_id)"))},
           {epoch_us.format(col=next_midnight)}
         ) AS next_us
  FROM events WHERE value IS NOT NULL
)
SELECT day,
       CAST(count(*) AS BIGINT) AS n_obs,
       CAST(SUM(next_us - t_us) AS BIGINT) AS span_us,
       CAST(floor(CAST(SUM(v4 * (next_us - t_us)) AS DOUBLE)
                  / CAST(SUM(next_us - t_us) AS DOUBLE) * 100 + 0.5)
            AS BIGINT) AS twap_micros
FROM obs
GROUP BY day
ORDER BY day
"""


def events_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day time-weighted average value (irregular-sampling mean).
    One SQL text shared with the oracle modulo the epoch-µs spelling;
    the window is day+user-free but DAY-partitioned, so it parallelizes
    over the calendar at any volume."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _twap_sql(
            "unix_micros({col})",
            "CAST(date_add(CAST(ts AS DATE), 1) AS TIMESTAMP)",
        )
    )


TWAP_ORACLE_SQL = _twap_sql(
    "epoch_us({col})",
    "CAST(CAST(ts AS DATE) + INTERVAL 1 DAY AS TIMESTAMP)",
)


# --------------------------------------------------------------------------
# 5. Interval merge (gaps-and-islands coverage)
# --------------------------------------------------------------------------

#: activity interval length hung off each event, µs
_INTERVAL_US = 300 * 1_000_000


def events_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user union of overlapping [ts, ts+5min) activity intervals:
    number of merged bursts and total covered µs. Cumulative-max island
    detection (an interval starts a new island iff it begins strictly
    after every earlier interval's end). All windows are USER-partitioned
    — parallel at any scale — and all arithmetic is exact epoch-µs."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    w = Window.partitionBy("user_id").orderBy("s_us", "event_id")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.lit(_INTERVAL_US).cast("long")).alias("e_us"),
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s_us",
        "e_us",
        F.when(
            F.col("s_us")
            > F.coalesce(
                F.max("e_us").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(-1).cast("long"),
            ),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id",
        "s_us",
        "e_us",
        F.sum("new_island")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island_id"),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.min("s_us").alias("isl_s"), F.max("e_us").alias("isl_e")
    )
    return (
        per_island.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_islands"),
            F.sum(F.col("isl_e") - F.col("isl_s")).cast("long").alias("covered_us"),
        )
        .orderBy("user_id")
    )


INTERVAL_MERGE_SQL = f"""
WITH iv AS (
  SELECT user_id,
         epoch_us(ts) AS s_us,
         epoch_us(ts) + {_INTERVAL_US} AS e_us,
         event_id
  FROM events WHERE user_id IS NOT NULL
),
flagged AS (
  SELECT user_id, s_us, e_us,
         CASE WHEN s_us > COALESCE(
                MAX(e_us) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1)
              THEN 1 ELSE 0 END AS new_island,
         event_id
  FROM iv
),
islands AS (
  SELECT user_id, s_us, e_us,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY s_us, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_id
  FROM flagged
),
per_island AS (
  SELECT user_id, island_id, MIN(s_us) AS isl_s, MAX(e_us) AS isl_e
  FROM islands GROUP BY 1, 2
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_islands,
       CAST(SUM(isl_e - isl_s) AS BIGINT) AS covered_us
FROM per_island
GROUP BY user_id
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# 6. SCD Type-2 history build
# --------------------------------------------------------------------------


def orders_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (Type 2) build over each customer's
    order-status stream: consecutive same-status runs collapse to one
    versioned row with [valid_from, valid_to) and an is_current flag.
    Run detection = lag≠current + running sum; ordering is the
    deterministic (o_orderdate, o_orderkey). Customer-partitioned
    windows + one customer-keyed aggregation — parallel at any scale."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.when(
            F.lag("o_orderstatus").over(w).isNull()
            | (F.lag("o_orderstatus").over(w) != F.col("o_orderstatus")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
        "o_orderkey",
    )
    runs = chg.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.sum("chg")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("version"),
    )
    collapsed = runs.groupBy("o_custkey", "version", "o_orderstatus").agg(
        F.min("o_orderdate").alias("valid_from"),
        F.count("*").cast("long").alias("n_orders"),
    )
    w2 = Window.partitionBy("o_custkey").orderBy("version")
    return (
        collapsed.select(
            "o_custkey",
            "version",
            "o_orderstatus",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
            "n_orders",
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int"),
        )
        .orderBy("o_custkey", "version")
    )


SCD2_SQL = """
WITH chg AS (
  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
         CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                OR LAG(o_orderstatus) OVER w <> o_orderstatus
              THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
runs AS (
  SELECT o_custkey, o_orderstatus, o_orderdate,
         CAST(SUM(chg) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM chg
),
collapsed AS (
  SELECT o_custkey, version, o_orderstatus,
         MIN(o_orderdate) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM runs GROUP BY 1, 2, 3
)
SELECT o_custkey, version, o_orderstatus, valid_from,
       LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY version)
         AS valid_to,
       n_orders,
       CAST(CASE WHEN LEAD(valid_from) OVER (PARTITION BY o_custkey
                                             ORDER BY version) IS NULL
                 THEN 1 ELSE 0 END AS INTEGER) AS is_current
FROM collapsed
ORDER BY o_custkey, version
"""


QUERIES = {
    "events_markov_transitions": events_markov_transitions,
    "events_acf_daily": events_acf_daily,
    "events_mad_anomaly": events_mad_anomaly,
    "events_twap_daily": events_twap_daily,
    "events_interval_merge": events_interval_merge,
    "orders_scd2_history": orders_scd2_history,
}

ORACLES = {
    "events_markov_transitions": MARKOV_SQL,
    "events_acf_daily": _acf_daily_sql("HUGEINT"),
    "events_mad_anomaly": MAD_SQL,
    "events_twap_daily": TWAP_ORACLE_SQL,
    "events_interval_merge": INTERVAL_MERGE_SQL,
    "orders_scd2_history": SCD2_SQL,
}
