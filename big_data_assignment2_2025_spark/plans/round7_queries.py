"""Round-7 queries: deterministic-sketch observability surfaces.

The round-7 theme is sketches whose STATE is engine-reproducible — the
HLL rolling-DAU twins live with their families
(``plans/round5_queries.py``, ``plans/streaming_queries.py``); this
module holds the histogram quantile sketch:

- **histogram quantiles** (``events_value_quantiles_hist``): per-type
  p50/p90/p99 of ``events.value`` via the mergeable fixed-range
  histogram of ``operators/sketches.py hist_quantile_sketch`` — integer
  bin counts that combine map-side (each task emits <= groups x 256
  rows whatever the event volume), quantile recovery by integer
  cumulative-count inversion, error bounded by one bin width. The
  monitoring shape a 100 TB pipeline runs hourly, where the exact
  rank-based path (``operators/ranking.py``) would re-rank the world.

No counterpart in the reference (index+query only); LLM-pipeline
extension per SURVEY.md §7.6, hash-gated against a literal DuckDB
mirror (integer-only algebra — no floats anywhere in the plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.sketches import hist_quantile_sketch
from ..sources.readers import load_table

#: events.value sits in (0, ~500]; the sketch domain is the fixed range
#: [0, 512) at micro precision — 256 bins of exactly 2.0 units. Values
#: outside saturate into the end bins (documented fixed-range-histogram
#: semantics; the fixture never exercises saturation, tests do).
VALUE_LO_MICRO = 0
VALUE_HI_MICRO = 512_000_000
VALUE_BINS = 256
VALUE_PERCENTS = [50, 90, 99]


def events_value_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type p50/p90/p99 of ``value`` from the mergeable
    histogram sketch (see module docstring)."""
    ev = load_table(spark, sf_dir, "events")
    return hist_quantile_sketch(
        ev,
        ["event_type"],
        "value",
        VALUE_LO_MICRO,
        VALUE_HI_MICRO,
        VALUE_BINS,
        VALUE_PERCENTS,
    )


# Literal mirror of hist_quantile_sketch's integer algebra: micro-round,
# clamp, width-256 binning, cumulative-count inversion with the integer
# ceil (n*p+99)//100. Width = 2_000_000 micros; every column BIGINT.
HIST_QUANTILES_SQL = """
WITH b AS (
  SELECT event_type,
         (least(greatest(CAST(round(value * 1e6) AS BIGINT), 0), 511999999)
          - 0) // 2000000 AS bin
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY event_type, bin
),
cum AS (
  SELECT event_type, bin, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM counts
),
tot AS (
  SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
  FROM counts GROUP BY event_type
),
cand AS (
  SELECT c.event_type, CAST(p.p_pct AS BIGINT) AS p_pct, t.n, c.bin
  FROM cum c
  JOIN tot t USING (event_type)
  CROSS JOIN (VALUES (50), (90), (99)) p(p_pct)
  WHERE c.cum >= (t.n * p.p_pct + 99) // 100
)
SELECT event_type, p_pct, n, MIN(bin) AS qbin,
       CAST(MIN(bin) * 2000000 + 0 AS BIGINT) AS q_lo_micro
FROM cand GROUP BY event_type, p_pct, n
"""


QUERIES = {
    "events_value_quantiles_hist": events_value_quantiles_hist,
}

ORACLES = {
    "events_value_quantiles_hist": HIST_QUANTILES_SQL,
}
