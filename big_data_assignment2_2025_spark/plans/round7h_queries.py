"""Round-7h queries: running-extremum analytics, churn accounting,
privacy audit, and dependence profiling.

- **revenue drawdown** (``orders_revenue_drawdown``): running peak of the
  cumulative daily revenue and the gap below it — the composition of two
  window extrema (cumsum, then running max) that finance calls drawdown
  and SRE calls "how far below high-water mark". Integer micros
  throughout; the windows run over the calendar-bounded daily aggregate.
- **day-over-day churn** (``events_day_churn``): for each consecutive
  observed-day pair, how many active users were retained, new, or
  churned. Exact set accounting via ONE self-join of the (day, user)
  distinct dimension shifted by a day — facts reduce to the dimension
  first, so the join is day-cardinality-bounded rows per user, never a
  fact-table pairing.
- **k-anonymity audit** (``customer_k_anonymity_audit``): group sizes of
  the quasi-identifier tuple (mktsegment, nationkey) with a k=5 flag —
  the governance readout that decides whether an export needs
  suppression. One aggregate; the violating-class list is the output.
- **segment PMI** (``events_segment_pmi``): pointwise mutual information
  between event type and customer market segment — "which behaviors are
  over/under-represented per segment". Uses the integerize-the-terms
  discipline (ln of the count ratio frozen to micro-nats per CELL —
  bounded 5x5 cells, each one frozen float chain), so the hash gate
  holds exactly.

No reference counterpart; analytics extensions per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

# --------------------------------------------------------------------------
# 1. Revenue drawdown
# --------------------------------------------------------------------------


def orders_revenue_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cumulative revenue, its running peak, and the drawdown gap
    (peak − cumulative), in exact integer micros."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(
            F.expr("CAST(round(CAST(o_totalprice AS DOUBLE) * 1e6) AS BIGINT)")
        ).alias("rev_micros")
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cum = daily.withColumn("cum_micros", F.sum("rev_micros").over(w_cum))
    peak = cum.withColumn("peak_micros", F.max("cum_micros").over(w_cum))
    return (
        peak.select(
            "day",
            "rev_micros",
            "cum_micros",
            "peak_micros",
            (F.col("peak_micros") - F.col("cum_micros")).alias("drawdown_micros"),
        )
        .orderBy("day")
    )


REVENUE_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(round(CAST(o_totalprice AS DOUBLE) * 1e6) AS BIGINT))
              AS BIGINT) AS rev_micros
  FROM orders GROUP BY 1
),
cum AS (
  SELECT day, rev_micros,
         CAST(SUM(rev_micros) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_micros
  FROM daily
)
SELECT day, rev_micros, cum_micros,
       CAST(MAX(cum_micros) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS peak_micros,
       CAST(MAX(cum_micros) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
            - cum_micros AS BIGINT) AS drawdown_micros
FROM cum
ORDER BY day
"""


# --------------------------------------------------------------------------
# 2. Day-over-day churn
# --------------------------------------------------------------------------


def events_day_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retained / new / churned user counts for each consecutive pair of
    observed days. The (day, user) distinct dimension full-outer-joins
    its own next-day shift; classification is pure projection."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    today = du.select("day", "user_id")
    yesterday = du.select(
        F.date_add("day", 1).alias("day"), F.col("user_id").alias("y_user")
    )
    paired = today.join(
        yesterday,
        (today["day"] == yesterday["day"]) & (today["user_id"] == yesterday["y_user"]),
        "full_outer",
    ).select(
        F.coalesce(today["day"], yesterday["day"]).alias("day"),
        today["user_id"].alias("t_user"),
        yesterday["y_user"],
    )
    observed = du.select("day").distinct()
    counted = (
        paired.groupBy("day")
        .agg(
            F.count_if(
                F.col("t_user").isNotNull() & F.col("y_user").isNotNull()
            ).cast("long").alias("retained"),
            F.count_if(
                F.col("t_user").isNotNull() & F.col("y_user").isNull()
            ).cast("long").alias("new_or_returning"),
            F.count_if(
                F.col("t_user").isNull() & F.col("y_user").isNotNull()
            ).cast("long").alias("churned"),
        )
    )
    # only pairs where BOTH days were observed are meaningful churn rows
    prev_observed = observed.select(F.date_add("day", 1).alias("day"))
    return (
        counted.join(observed, "day", "left_semi")
        .join(prev_observed, "day", "left_semi")
        .orderBy("day")
    )


DAY_CHURN_SQL = """
WITH du AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id
  FROM events WHERE user_id IS NOT NULL
),
shifted AS (SELECT day + 1 AS day, user_id AS y_user FROM du),
paired AS (
  SELECT COALESCE(t.day, s.day) AS day, t.user_id AS t_user, s.y_user
  FROM du t FULL OUTER JOIN shifted s
    ON t.day = s.day AND t.user_id = s.y_user
),
counted AS (
  SELECT day,
         CAST(count(*) FILTER (WHERE t_user IS NOT NULL AND y_user IS NOT NULL) AS BIGINT) AS retained,
         CAST(count(*) FILTER (WHERE t_user IS NOT NULL AND y_user IS NULL) AS BIGINT) AS new_or_returning,
         CAST(count(*) FILTER (WHERE t_user IS NULL AND y_user IS NOT NULL) AS BIGINT) AS churned
  FROM paired GROUP BY day
),
observed AS (SELECT DISTINCT day FROM du)
SELECT c.*
FROM counted c
JOIN observed o1 ON o1.day = c.day
JOIN observed o2 ON o2.day + 1 = c.day
ORDER BY c.day
"""


# --------------------------------------------------------------------------
# 3. k-anonymity audit
# --------------------------------------------------------------------------

_K_ANON = 5


def customer_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equivalence-class sizes of the quasi-identifier (mktsegment,
    nationkey), flagged below k=5 — the export-governance readout."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment", "c_nationkey")
        .agg(F.count("*").cast("long").alias("class_size"))
        .withColumn(
            "violates_k", F.when(F.col("class_size") < _K_ANON, 1).otherwise(0).cast("int")
        )
        .orderBy("c_mktsegment", "c_nationkey")
    )


K_ANONYMITY_SQL = f"""
SELECT c_mktsegment, c_nationkey,
       CAST(count(*) AS BIGINT) AS class_size,
       CAST(CASE WHEN count(*) < {_K_ANON} THEN 1 ELSE 0 END AS INTEGER)
         AS violates_k
FROM customer
GROUP BY c_mktsegment, c_nationkey
ORDER BY c_mktsegment, c_nationkey
"""


# --------------------------------------------------------------------------
# 4. Segment PMI
# --------------------------------------------------------------------------

#: integer scale for per-cell PMI micro-nats
_PMI_SCALE = 1_000_000


def events_segment_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information of (event_type, market segment):
    pmi = ln(n_xy · N / (n_x · n_y)) per cell — positive where a segment
    over-indexes on a behavior. Cells are the bounded 5×5 cross of two
    small domains; each cell's pmi is ONE frozen ln over an exact integer
    rational, micro-rounded, so the gate hashes exactly. One fact join +
    three small aggregates."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    joined = ev.join(F.broadcast(cust), "user_id").select(
        "event_type", "c_mktsegment"
    )
    cells = joined.groupBy("event_type", "c_mktsegment").agg(
        F.count("*").alias("n_xy")
    )
    by_type = joined.groupBy("event_type").agg(F.count("*").alias("n_x"))
    by_seg = joined.groupBy("c_mktsegment").agg(F.count("*").alias("n_y"))
    total = joined.agg(F.count("*").alias("n_total"))  # 1-row scalar, stays lazy
    return (
        cells.join(F.broadcast(by_type), "event_type")
        .join(F.broadcast(by_seg), "c_mktsegment")
        .crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "c_mktsegment",
            F.col("n_xy").cast("long").alias("n_xy"),
            F.expr(
                f"CAST(floor(ln(CAST(n_xy AS DOUBLE) * CAST(n_total AS DOUBLE)"
                f" / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))"
                f" * {_PMI_SCALE} + 0.5) AS BIGINT)"
            ).alias("pmi_micro_nats"),
        )
        .orderBy("event_type", "c_mktsegment")
    )


def _segment_pmi_oracle() -> str:
    return f"""
WITH joined AS (
  SELECT e.event_type, c.c_mktsegment
  FROM events e JOIN customer c ON e.user_id = c.c_custkey
  WHERE e.user_id IS NOT NULL
),
cells AS (
  SELECT event_type, c_mktsegment, count(*) AS n_xy
  FROM joined GROUP BY 1, 2
),
by_type AS (SELECT event_type, count(*) AS n_x FROM joined GROUP BY 1),
by_seg AS (SELECT c_mktsegment, count(*) AS n_y FROM joined GROUP BY 1),
total AS (SELECT count(*) AS n FROM joined)
SELECT cells.event_type, cells.c_mktsegment,
       CAST(cells.n_xy AS BIGINT) AS n_xy,
       CAST(floor(ln(CAST(cells.n_xy AS DOUBLE) * CAST(total.n AS DOUBLE)
                     / (CAST(by_type.n_x AS DOUBLE) * CAST(by_seg.n_y AS DOUBLE)))
                  * {_PMI_SCALE} + 0.5) AS BIGINT) AS pmi_micro_nats
FROM cells
JOIN by_type USING (event_type)
JOIN by_seg USING (c_mktsegment)
CROSS JOIN total
ORDER BY cells.event_type, cells.c_mktsegment
"""


# --------------------------------------------------------------------------
# 5. Rolling 7-day trend slope
# --------------------------------------------------------------------------

#: window length for the rolling least-squares trend
_SLOPE_N = 7


def events_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day least-squares trend slope of daily event value —
    "is this metric trending up or down, and how fast", per day.

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with x = 0..6 the position
    inside the window and y the integer-micro daily values entering as 7
    explicit lag columns — so numerator and the CONSTANT denominator
    (n·Σx²−(Σx)² = 7·91−441 = 196) are exact BIGINTs and the only float
    op is one final division, micro-rounded. Same calendar-bounded daily
    frame discipline as the EWMA chart; rows need a full 7-day history."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.expr("CAST(floor(round(value, 4) * 10000 + 0.5) AS BIGINT)")
        ).alias("v_us")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "v_us",
        *[
            F.lag("v_us", k).over(w).alias(f"l{k}")
            for k in range(1, _SLOPE_N)
        ],
    ).where(F.col(f"l{_SLOPE_N - 1}").isNotNull())
    # y_i at window position x_i: l6 is oldest (x=0) ... v_us newest (x=6)
    ys = [F.col(f"l{_SLOPE_N - 1 - i}") if i < _SLOPE_N - 1 else F.col("v_us") for i in range(_SLOPE_N)]
    sum_y = None
    sum_xy = None
    for x, y in enumerate(ys):
        sum_y = y if sum_y is None else sum_y + y
        term = y * F.lit(x).cast("long")
        sum_xy = term if sum_xy is None else sum_xy + term
    n = _SLOPE_N
    sum_x = n * (n - 1) // 2            # 21
    den = n * sum(x * x for x in range(n)) - sum_x * sum_x  # 196
    slope = (F.lit(n).cast("long") * sum_xy - F.lit(sum_x).cast("long") * sum_y) / F.lit(
        float(den)
    )
    return (
        lagged.select(
            "day",
            F.round(F.col("v_us") / 10000.0, 6).alias("value"),
            F.round(slope / 10000.0, 6).alias("slope_per_day"),
        )
        .orderBy("day")
    )


_SLOPE_YS = ", ".join(
    f"LAG(v_us, {k}) OVER (ORDER BY day) AS l{k}" for k in range(1, _SLOPE_N)
)
_SLOPE_SUM_Y = " + ".join(
    [f"l{_SLOPE_N - 1 - i}" for i in range(_SLOPE_N - 1)] + ["v_us"]
)
_SLOPE_SUM_XY = " + ".join(
    [f"l{_SLOPE_N - 1 - i} * {i}" for i in range(_SLOPE_N - 1)]
    + [f"v_us * {_SLOPE_N - 1}"]
)

ROLLING_SLOPE_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(floor(round(value, 4) * 10000 + 0.5) AS BIGINT)) AS v_us
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
lagged AS (
  SELECT day, v_us, {_SLOPE_YS}
  FROM daily
)
SELECT day,
       round(v_us / 10000.0, 6) AS value,
       round((({_SLOPE_N} * ({_SLOPE_SUM_XY}) - 21 * ({_SLOPE_SUM_Y})) / 196.0)
             / 10000.0, 6) AS slope_per_day
FROM lagged
WHERE l{_SLOPE_N - 1} IS NOT NULL
ORDER BY day
"""


QUERIES = {
    "orders_revenue_drawdown": orders_revenue_drawdown,
    "events_day_churn": events_day_churn,
    "customer_k_anonymity_audit": customer_k_anonymity_audit,
    "events_segment_pmi": events_segment_pmi,
    "events_rolling_slope": events_rolling_slope,
}

ORACLES = {
    "orders_revenue_drawdown": REVENUE_DRAWDOWN_SQL,
    "events_day_churn": DAY_CHURN_SQL,
    "customer_k_anonymity_audit": K_ANONYMITY_SQL,
    "events_segment_pmi": _segment_pmi_oracle(),
    "events_rolling_slope": ROLLING_SLOPE_SQL,
}
