"""Round-7g queries: time-series decomposition.

- **seasonal decomposition** (``events_seasonal_decompose``): the classic
  additive trend/seasonal/remainder split of a daily metric — centered
  7-row moving-average trend, day-of-week seasonal means of the detrended
  series, remainder as what's left. The monitoring shape behind "is this
  drop a weekend or an incident".

  Cross-engine determinism is engineered, not hoped for: daily values
  become integer ten-thousandths (one frozen floor(x·1e4+0.5) per row,
  then BIGINT sums — order-independent), the trend is carried as the
  integer 7-day SUM, and the detrended series is the exact integer
  ``7·v − trend_sum`` (scaling by 7 instead of dividing keeps every
  aggregate integer). The only float ops are one fixed division chain per
  OUTPUT cell — identical expressions in Spark and DuckDB, so the gate
  hashes exactly. Day-of-week is ``epoch_days mod 7`` (calendar-function
  conventions differ between engines; arithmetic doesn't).

  Scale: the windows run over the DAILY AGGREGATE, whose row count is
  bounded by the calendar (~36.5k rows per century) however large the
  event table is — the unpartitioned ordered window is a deliberate,
  bounded single-task step on sketch-sized data, same discipline as the
  ranking operators' bounded driver stages. The trend frame is the 7
  neighboring OBSERVED days (rows, not calendar positions); compose with
  ``orders_daily_gapfill`` first when the series has holes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table

#: integer scale for value micros (4 decimals)
_SCALE = 10_000


def events_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-value series split into trend (centered 7-row moving
    average), day-of-week seasonal, and remainder; only days with a full
    7-row trend window are emitted."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(
            F.expr(f"CAST(floor(round(value, 4) * {_SCALE} + 0.5) AS BIGINT)")
        ).alias("v_us")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = (
        daily.withColumn("n7", F.count("*").over(w7))
        .withColumn("t_us", F.sum("v_us").over(w7))
        .where(F.col("n7") == 7)
        .withColumn("d7", F.lit(7).cast("long") * F.col("v_us") - F.col("t_us"))
        .withColumn(
            "dow", F.pmod(F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")), F.lit(7))
        )
    )
    seas = t.groupBy("dow").agg(
        F.sum("d7").alias("s_num"), F.count("*").alias("s_cnt")
    )
    den = float(7 * _SCALE)
    return (
        t.join(F.broadcast(seas), "dow")
        .select(
            "day",
            F.round(F.col("v_us") / float(_SCALE), 6).alias("value"),
            F.round(F.col("t_us") / den, 6).alias("trend"),
            F.round((F.col("s_num") / F.col("s_cnt")) / den, 6).alias("seasonal"),
            F.round(
                (F.col("d7") - F.col("s_num") / F.col("s_cnt")) / den, 6
            ).alias("remainder"),
        )
        .orderBy("day")
    )


SEASONAL_DECOMPOSE_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(floor(round(value, 4) * {_SCALE} + 0.5) AS BIGINT)) AS v_us
  FROM events WHERE value IS NOT NULL
  GROUP BY 1
),
t AS (
  SELECT day, v_us,
         COUNT(*) OVER w AS n7,
         SUM(v_us) OVER w AS t_us
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
d AS (
  SELECT day, v_us, t_us,
         7 * v_us - t_us AS d7,
         ((day - DATE '1970-01-01') % 7 + 7) % 7 AS dow
  FROM t WHERE n7 = 7
),
seas AS (
  SELECT dow, SUM(d7) AS s_num, COUNT(*) AS s_cnt FROM d GROUP BY dow
)
SELECT d.day,
       round(d.v_us / {float(_SCALE)}, 6) AS value,
       round(d.t_us / {float(7 * _SCALE)}, 6) AS trend,
       round((seas.s_num / seas.s_cnt) / {float(7 * _SCALE)}, 6) AS seasonal,
       round((d.d7 - seas.s_num / seas.s_cnt) / {float(7 * _SCALE)}, 6) AS remainder
FROM d JOIN seas USING (dow)
ORDER BY d.day
"""


QUERIES = {
    "events_seasonal_decompose": events_seasonal_decompose,
}

ORACLES = {
    "events_seasonal_decompose": SEASONAL_DECOMPOSE_SQL,
}
