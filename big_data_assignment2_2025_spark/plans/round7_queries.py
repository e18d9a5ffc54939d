"""Round-7 queries: deterministic-sketch observability surfaces.

The round-7 theme is sketches whose STATE is engine-reproducible
(SCALING §13) — the HLL rolling-DAU twins live with their families
(``plans/round5_queries.py``, ``plans/streaming_queries.py``); this
module holds the rest of the deterministic-sketch surface:

- **histogram quantiles** (``events_value_quantiles_hist``): per-type
  p50/p90/p99 of ``events.value`` via the mergeable fixed-range
  histogram of ``operators/sketches.py hist_quantile_sketch`` — integer
  bin counts that combine map-side (each task emits <= groups x 256
  rows whatever the event volume), quantile recovery by integer
  cumulative-count inversion, error bounded by one bin width. The
  monitoring shape a 100 TB pipeline runs hourly, where the exact
  rank-based path (``operators/ranking.py``) would re-rank the world.
- **rolling quantiles** (``events_rolling_quantiles_hist``): 7-day
  sliding p50/p99 by ADDING day histograms over a bounded count fan-out
  — exact quantiles don't decompose over sliding windows; counts do.
- **HLL set algebra** (``events_audience_overlap_hll``): distinct-user
  union by per-bucket register max, intersection by inclusion-exclusion
  on the micro-rounded estimates — audience overlap without ever
  shuffling a user set.
- **one-scan profiling** (``lineitem_distinct_profile_hll``): per-column
  approx distinct via a stack unpivot feeding per-column registers.
- **Bloom semi-join pruning** (``orders_bloom_prune``): 4 KB bit_or
  bitmap build, literal-map codegen probe with zero joins/exchanges on
  the fact side, deterministic false-positive set.

No counterpart in the reference (index+query only); LLM-pipeline
extension per SURVEY.md §7.6, hash-gated against a literal DuckDB
mirror (integer algebra + frozen-order IEEE tails only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    bloom_bitmap,
    bloom_probe_flag,
    hist_quantile_sketch,
    hll_estimate,
    hll_merge,
    hll_registers,
)
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


def events_audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra WITHOUT moving user sets: how many distinct
    users viewed, purchased, did either, did both — from per-segment HLL
    registers only.

    This is the operation that justifies sketches at 100 TB: the exact
    answer needs a distinct-user shuffle per segment PLUS an intersection
    join; the sketch answer merges two 512-register arrays (per-bucket
    max = union is the one set operation HLL supports natively) and gets
    the intersection by inclusion-exclusion on the three estimates —
    |A∩B| = |A| + |B| - |A∪B| — as BIGINT subtraction of already-rounded
    micro estimates, so the whole query stays hash-gated. Standard
    caveat, inherited from HLL itself: the intersection's ERROR scales
    with the union size, so it is a monitoring number for
    comparably-sized audiences, not a precision instrument for tiny
    overlaps (tests bound it against the exact intersection). Per-segment
    ``v_empty`` is emitted alongside the raw estimates so callers can
    apply the ln-based small-range correction driver-side (the
    ``hll_estimate`` contract) — at fixture scale the correction is the
    difference between 374 and the true 15, so tests correct first.

    One register build (groupBy event_type — map-side partial, 2 x 512
    rows), one merge, three estimates, one row out."""
    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(
        ev.where(F.col("event_type").isin("view", "purchase")),
        ["event_type"],
        "user_id",
    )
    tagged = regs.select(
        F.col("event_type").alias("s"), "bucket", "r"
    ).unionAll(
        hll_merge(regs, []).select(F.lit("union").alias("s"), "bucket", "r")
    )
    est = hll_estimate(tagged, ["s"], out_col="est_micro")

    def _pick(seg: str, col: str):
        return F.max(F.when(F.col("s") == seg, F.col(col)))

    wide = est.groupBy().agg(
        _pick("view", "est_micro").alias("view_users_micro"),
        _pick("purchase", "est_micro").alias("purchase_users_micro"),
        _pick("union", "est_micro").alias("either_users_micro"),
        _pick("view", "v_empty").alias("view_v_empty"),
        _pick("purchase", "v_empty").alias("purchase_v_empty"),
        _pick("union", "v_empty").alias("either_v_empty"),
    )
    return wide.select(
        "view_users_micro",
        "purchase_users_micro",
        "either_users_micro",
        (
            F.col("view_users_micro")
            + F.col("purchase_users_micro")
            - F.col("either_users_micro")
        ).alias("both_users_micro"),
        "view_v_empty",
        "purchase_v_empty",
        "either_v_empty",
    )


# Literal mirror: per-type registers, union by per-bucket max over both
# sets, the frozen-order estimate chain per segment, inclusion-exclusion
# as BIGINT subtraction of the micro-rounded estimates.
AUDIENCE_OVERLAP_SQL = """
WITH br AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT % 512
           AS bucket,
         CASE WHEN ((('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT) >> 9) = 0 THEN 44
              ELSE 44 - length(bin((('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT) >> 9)) END
           AS rho
  FROM events
  WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')
),
regs AS (
  SELECT event_type AS s, bucket, MAX(rho) AS r
  FROM br GROUP BY event_type, bucket
),
tagged AS (
  SELECT s, bucket, r FROM regs
  UNION ALL
  SELECT 'union' AS s, bucket, MAX(r) AS r FROM regs GROUP BY bucket
),
agg AS (
  SELECT s,
         CAST(512 - COUNT(*) AS BIGINT) AS v_empty,
         CAST(CAST(SUM(CAST(1 AS BIGINT) << (44 - r)) AS BIGINT)
              + (512 - COUNT(*)) * 17592186044416 AS BIGINT) AS reg_sum
  FROM tagged GROUP BY s
),
est AS (
  SELECT s, v_empty,
         CAST(round((0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0
                    * 17592186044416.0 / CAST(reg_sum AS DOUBLE) * 1000000.0)
              AS BIGINT) AS est_micro
  FROM agg
)
SELECT MAX(CASE WHEN s = 'view' THEN est_micro END) AS view_users_micro,
       MAX(CASE WHEN s = 'purchase' THEN est_micro END) AS purchase_users_micro,
       MAX(CASE WHEN s = 'union' THEN est_micro END) AS either_users_micro,
       MAX(CASE WHEN s = 'view' THEN est_micro END)
         + MAX(CASE WHEN s = 'purchase' THEN est_micro END)
         - MAX(CASE WHEN s = 'union' THEN est_micro END) AS both_users_micro,
       MAX(CASE WHEN s = 'view' THEN v_empty END) AS view_v_empty,
       MAX(CASE WHEN s = 'purchase' THEN v_empty END) AS purchase_v_empty,
       MAX(CASE WHEN s = 'union' THEN v_empty END) AS either_v_empty
FROM est
"""


# Per-day variant of the histogram-quantile mirror — the oracle for the
# STREAMING twin (streaming/stream.py run_streaming_value_quantiles): the
# update-log reconciliation (max per (day, bin)) recovers exactly these
# batch counts, so one SQL serves the incremental deployment.
DAILY_HIST_QUANTILES_SQL = """
WITH b AS (
  SELECT CAST(ts AS DATE) AS day,
         (least(greatest(CAST(round(value * 1e6) AS BIGINT), 0), 511999999)
          - 0) // 2000000 AS bin
  FROM events WHERE value IS NOT NULL
),
counts AS (
  SELECT day, bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY day, bin
),
cum AS (
  SELECT day, bin, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY day ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM counts
),
tot AS (SELECT day, CAST(SUM(cnt) AS BIGINT) AS n FROM counts GROUP BY day),
cand AS (
  SELECT c.day, CAST(p.p_pct AS BIGINT) AS p_pct, t.n, c.bin
  FROM cum c
  JOIN tot t USING (day)
  CROSS JOIN (VALUES (50), (90), (99)) p(p_pct)
  WHERE c.cum >= (t.n * p.p_pct + 99) // 100
)
SELECT day, p_pct, n, MIN(bin) AS qbin,
       CAST(MIN(bin) * 2000000 + 0 AS BIGINT) AS q_lo_micro
FROM cand GROUP BY day, p_pct, n
"""


def events_rolling_quantiles_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day p50/p99 of ``value`` per day — the quantile analog
    of the rolling-DAU pair, and the reason the histogram sketch earns
    its place: EXACT quantiles do not decompose over sliding windows (a
    window's percentile cannot be computed from per-day percentiles, only
    from re-ranking the window's raw rows — 7x the fact volume per day),
    but histogram COUNTS add. So: per-day bin counts (map-side partial,
    <= days x 256 rows off the scan), a bounded 7-day fan-out of COUNT
    rows, one summing merge per (window, bin), and the integer inversion.
    Shuffle O(days x 256 x 7) whatever the event volume — same shape the
    deterministic HLL gives rolling distinct (SCALING §13, measured in
    DAUSKETCH_r7.json). Observedness mirrors the DAU queries: a day is
    emitted iff observed (row existence) and its window holds >= 1 count."""
    width = (VALUE_HI_MICRO - VALUE_LO_MICRO) // VALUE_BINS
    ev = load_table(spark, sf_dir, "events")
    from ..operators.sketches import hist_bin_expr, hist_quantiles_from_counts

    proj = ev.where(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("day"),
        hist_bin_expr("value", VALUE_LO_MICRO, VALUE_HI_MICRO, width).alias(
            "bin"
        ),
    )
    day_counts = proj.groupBy("day", "bin").agg(F.count("*").alias("cnt"))
    fan = day_counts.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "win_day"
        ),
        "bin",
        "cnt",
    )
    observed = ev.select(F.to_date("ts").alias("win_day")).distinct()
    win_counts = (
        fan.join(observed, "win_day")
        .groupBy("win_day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return hist_quantiles_from_counts(
        win_counts, ["win_day"], VALUE_LO_MICRO, width, [50, 99]
    ).select(
        F.col("win_day").alias("day"), "p_pct", "n", "qbin", "q_lo_micro"
    )


# Literal mirror of the rolling composition: day counts -> bounded count
# fan-out -> summing window merge -> the same integer inversion as
# HIST_QUANTILES_SQL (n from a full-frame MAX of cum, matching
# hist_quantiles_from_counts).
ROLLING_HIST_QUANTILES_SQL = """
WITH b AS (
  SELECT CAST(ts AS DATE) AS day,
         (least(greatest(CAST(round(value * 1e6) AS BIGINT), 0), 511999999)
          - 0) // 2000000 AS bin
  FROM events WHERE value IS NOT NULL
),
dc AS (
  SELECT day, bin, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM b GROUP BY day, bin
),
fan AS (
  SELECT day + CAST(t.k AS INTEGER) AS win_day, bin, cnt
  FROM dc, range(7) t(k)
),
obs AS (SELECT DISTINCT CAST(ts AS DATE) AS win_day FROM events),
wc AS (
  SELECT f.win_day, f.bin, CAST(SUM(f.cnt) AS BIGINT) AS cnt
  FROM fan f JOIN obs USING (win_day)
  GROUP BY f.win_day, f.bin
),
cum AS (
  SELECT win_day, bin,
         CAST(SUM(cnt) OVER (PARTITION BY win_day ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum
  FROM wc
),
cum2 AS (
  SELECT win_day, bin, cum,
         MAX(cum) OVER (PARTITION BY win_day ORDER BY bin
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n
  FROM cum
),
cand AS (
  SELECT c.win_day, CAST(p.p_pct AS BIGINT) AS p_pct, c.n, c.bin
  FROM cum2 c
  CROSS JOIN (VALUES (50), (99)) p(p_pct)
  WHERE c.cum >= (c.n * p.p_pct + 99) // 100
)
SELECT win_day AS day, p_pct, n, MIN(bin) AS qbin,
       CAST(MIN(bin) * 2000000 + 0 AS BIGINT) AS q_lo_micro
FROM cand GROUP BY win_day, p_pct, n
"""


def orders_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning readout: how many orders rows a
    4 KB broadcast bitmap keeps versus the exact semi-join against
    BUILDING-segment customers — the runtime-filter pattern that prunes a
    100 TB probe scan without shuffling it.

    Build side: the segment's customer keys fold into <= 512 (word, bits)
    rows by an idempotent ``bit_or`` (map-side partial; bitmaps from
    different shards merge by ``bit_or`` exactly like HLL registers merge
    by ``max``), collected once as bounded driver state. Probe side:
    orders evaluates a literal-map lookup + bitwise test per hash, all
    inside codegen — ZERO joins and ZERO exchanges in the probe plan
    (test-asserted). Because the k=2
    double-hash positions are deterministic md5 bit-slices, the
    false-positive SET (not just its rate) is engine-reproducible, which
    is what lets this query hash-gate. Output pins the pruning quality:
    (n_orders, n_bloom_pass, n_true_match, n_false_positives); no false
    negatives by construction (test-asserted row-level)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    seg = cust.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    bm = bloom_bitmap(seg, "c_custkey")
    probed = bloom_probe_flag(orders.select("o_custkey"), "o_custkey", bm)
    truth = seg.distinct().withColumn("_true", F.lit(True))
    flagged = probed.join(
        F.broadcast(truth),
        probed["o_custkey"] == truth["c_custkey"],
        "left",
    )
    return flagged.agg(
        F.count("*").alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias(
            "n_bloom_pass"
        ),
        F.sum(F.when(F.col("_true").isNotNull(), 1).otherwise(0)).alias(
            "n_true_match"
        ),
        F.sum(
            F.when(F.col("bloom_pass") & F.col("_true").isNull(), 1).otherwise(0)
        ).alias("n_false_positives"),
    )


# Literal mirror of bloom_bitmap/bloom_probe_flag: same md5 slices, same
# double-hash positions (h1 + i*h2 mod 32256), 63-bit words (bit 63 is
# the one position DuckDB's checked shift and the JVM's wrapping shift
# disagree on, so neither engine ever sets it), bit_or fold, two probe
# lookups per key.
BLOOM_PRUNE_SQL = """
WITH seg AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
hp AS (
  SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 14, 13))::BIGINT AS h2
  FROM seg
),
pos AS (
  SELECT (h1 + CAST(t.k AS BIGINT) * h2) % 32256 AS pos
  FROM hp, range(2) t(k)
),
bm AS (
  SELECT pos // 63 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
  FROM pos GROUP BY pos // 63
),
op AS (
  SELECT o_custkey,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 14, 13))::BIGINT AS h2
  FROM orders
),
probed AS (
  SELECT o.o_custkey,
         COALESCE((b0.bits
            & (CAST(1 AS BIGINT) << CAST((o.h1 % 32256) % 63 AS INTEGER)))
            != 0, FALSE)
         AND COALESCE((b1.bits
            & (CAST(1 AS BIGINT) << CAST(((o.h1 + o.h2) % 32256) % 63 AS INTEGER)))
            != 0, FALSE) AS bloom_pass
  FROM op o
  LEFT JOIN bm b0 ON (o.h1 % 32256) // 63 = b0.word
  LEFT JOIN bm b1 ON ((o.h1 + o.h2) % 32256) // 63 = b1.word
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN p.bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bloom_pass,
       CAST(SUM(CASE WHEN s.c_custkey IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true_match,
       CAST(SUM(CASE WHEN p.bloom_pass AND s.c_custkey IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_false_positives
FROM probed p
LEFT JOIN (SELECT DISTINCT c_custkey FROM seg) s ON p.o_custkey = s.c_custkey
"""


#: Columns profiled by lineitem_distinct_profile_hll — a mix of key-like
#: (high-cardinality) and enum-like columns, so the readout exercises
#: both HLL regimes.
PROFILE_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
                "l_linestatus"]


def lineitem_distinct_profile_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-scan data profiling: approximate distinct-value count for five
    lineitem columns from a SINGLE pass — the table-profiling tool a
    100 TB warehouse runs after every load, where five exact
    COUNT(DISTINCT)s would be five full-key shuffles (or one 5-way Expand
    that quintuples the scan's output rows into one giant shuffle).

    The ``stack`` generator unpivots the five columns to (col, val)
    STRING pairs in-projection; ``hll_registers`` folds them map-side to
    <= 5 x 512 register rows — the only shuffle, independent of row count
    and of every column's cardinality. Emits the usual
    (v_empty, reg_sum, raw estimate) triple per column; small-range
    correction driver-side as always."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = ", ".join(
        f"'{c}', CAST({c} AS STRING)" for c in PROFILE_COLS
    )
    unpivoted = li.select(
        F.expr(f"stack({len(PROFILE_COLS)}, {pairs}) AS (col, val)")
    )
    regs = hll_registers(unpivoted, ["col"], "val")
    return hll_estimate(regs, ["col"], out_col="n_distinct_micro").select(
        "col", "v_empty", "reg_sum", "n_distinct_micro"
    )


# Literal mirror: UNION ALL unpivot (same CAST-to-string values), same
# register algebra and frozen estimate chain as HLL_ROLLING_DAU_SQL.
DISTINCT_PROFILE_SQL = """
WITH unpv AS (
  SELECT 'l_orderkey' AS col, CAST(l_orderkey AS VARCHAR) AS val FROM lineitem
  UNION ALL
  SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_returnflag', CAST(l_returnflag AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR) FROM lineitem
),
br AS (
  SELECT col,
         ('0x' || substr(md5(val), 1, 13))::BIGINT % 512 AS bucket,
         CASE WHEN ((('0x' || substr(md5(val), 1, 13))::BIGINT) >> 9) = 0
              THEN 44
              ELSE 44 - length(bin((('0x' || substr(md5(val), 1, 13))::BIGINT) >> 9))
         END AS rho
  FROM unpv WHERE val IS NOT NULL
),
regs AS (SELECT col, bucket, MAX(rho) AS r FROM br GROUP BY col, bucket),
agg AS (
  SELECT col,
         CAST(512 - COUNT(*) AS BIGINT) AS v_empty,
         CAST(CAST(SUM(CAST(1 AS BIGINT) << (44 - r)) AS BIGINT)
              + (512 - COUNT(*)) * 17592186044416 AS BIGINT) AS reg_sum
  FROM regs GROUP BY col
)
SELECT col, v_empty, reg_sum,
       CAST(round((0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0
                  * 17592186044416.0 / CAST(reg_sum AS DOUBLE) * 1000000.0)
            AS BIGINT) AS n_distinct_micro
FROM agg
"""


#: Watchlist for the CMS point-estimate readout: a fixed literal key set
#: (user ids 1..10) so the lookup is IN-list-pushed on the exact side
#: and pure arithmetic on the sketch side.
CMS_WATCH_USERS = list(range(1, 11))


def events_user_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-frequency estimates for a fixed watchlist from a
    Count-Min sketch built in ONE scan — the frequency-monitoring shape
    (abuse/rate watchlists) where exact per-key counts would shuffle the
    full user universe every run.

    The counter build shuffles <= 3 x 1024 rows whatever the event
    volume (``cms_counters``); the watchlist lookup is d broadcast joins
    against the counter table plus a min — and the exact side, run here
    for the readout, is an IN-list-pushed filtered aggregate that never
    touches the rest of the key universe. Output pins the one-sided CMS
    guarantee row by row: est_cnt >= true_cnt always (never an
    undercount, test-asserted), overcount bounded by bucket collisions.
    Deterministic md5 double hashing → the estimates (collisions and
    all) are bit-identical on any engine: hash-gated."""
    from ..operators.sketches import cms_counters, cms_estimate_for_keys

    ev = load_table(spark, sf_dir, "events")
    counters = cms_counters(ev, "user_id")
    watch = spark.createDataFrame(
        [(int(u),) for u in CMS_WATCH_USERS], "user_id long"
    )
    est = cms_estimate_for_keys(counters, watch, "user_id")
    true_cnt = (
        ev.where(F.col("user_id").isin(CMS_WATCH_USERS))
        .groupBy("user_id")
        .agg(F.count("*").alias("true_cnt"))
    )
    return (
        est.join(true_cnt, "user_id", "left")
        .select(
            "user_id",
            "est_cnt",
            F.coalesce(F.col("true_cnt"), F.lit(0).cast("long")).alias(
                "true_cnt"
            ),
        )
    )


# Literal mirror: one-scan counter build (3 positions per row via the
# range(3) fan-out, folded by GROUP BY), per-key min-over-rows lookup,
# IN-list exact counts for the same watchlist.
CMS_USER_FREQ_SQL = """
WITH h AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 14, 13))::BIGINT AS h2
  FROM events WHERE user_id IS NOT NULL
),
counters AS (
  SELECT CAST(t.k AS BIGINT) AS row,
         (h1 + CAST(t.k AS BIGINT) * h2) % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM h, range(3) t(k)
  GROUP BY CAST(t.k AS BIGINT), (h1 + CAST(t.k AS BIGINT) * h2) % 1024
),
watch AS (
  SELECT CAST(t.k + 1 AS BIGINT) AS user_id,
         ('0x' || substr(md5(CAST(t.k + 1 AS VARCHAR)), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(t.k + 1 AS VARCHAR)), 14, 13))::BIGINT AS h2
  FROM range(10) t(k)
),
est AS (
  SELECT w.user_id,
         least(
           COALESCE(c0.cnt, 0),
           COALESCE(c1.cnt, 0),
           COALESCE(c2.cnt, 0)
         ) AS est_cnt
  FROM watch w
  LEFT JOIN counters c0 ON c0.row = 0 AND c0.bucket = (w.h1 + 0 * w.h2) % 1024
  LEFT JOIN counters c1 ON c1.row = 1 AND c1.bucket = (w.h1 + 1 * w.h2) % 1024
  LEFT JOIN counters c2 ON c2.row = 2 AND c2.bucket = (w.h1 + 2 * w.h2) % 1024
),
tc AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM events
  WHERE user_id IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
  GROUP BY user_id
)
SELECT e.user_id, CAST(e.est_cnt AS BIGINT) AS est_cnt,
       COALESCE(t.true_cnt, 0) AS true_cnt
FROM est e LEFT JOIN tc t USING (user_id)
"""


def events_audience_diff_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra WITH set difference: how many distinct users
    viewed, purchased, did either, did both, viewed-but-never-purchased,
    purchased-but-never-viewed — from two <=256-row KMV samples.

    The query HLL structurally cannot answer: inclusion-exclusion gives
    |A∩B| but A∖B membership needs an actual SAMPLE of the distinct
    universe, and the KMV threshold property provides one — a hash below
    both thetas is in A's sample iff it is in A at all, so the
    difference counts are exact lookups over the <=512 joined sample
    rows, scaled by the shared union estimator (theta-sketch a-not-b).
    When both audiences have < k distinct users the samples are complete
    and every output is EXACT (the sf0.001 fixture regime). All counts
    are integers and each estimate is one frozen-order IEEE chain
    (``kmv_est_micro``), so the whole row hash-gates.

    One distinct-dimension reduce (map-side partial), one
    WindowGroupLimit-pruned re-rank, then a <=512-row full-outer join
    and a single-row aggregate."""
    from ..operators.sketches import KMV_K, kmv_est_micro, kmv_sketch, kmv_theta

    ev = load_table(spark, sf_dir, "events")
    sk = kmv_sketch(
        ev.where(F.col("event_type").isin("view", "purchase")),
        ["event_type"],
        "user_id",
    )
    th = kmv_theta(sk, ["event_type"])

    def _pick(seg: str, col: str):
        return F.max(F.when(F.col("event_type") == seg, F.col(col)))

    th_wide = th.groupBy().agg(
        _pick("view", "theta").alias("ta"),
        _pick("view", "n_sample").alias("na"),
        _pick("purchase", "theta").alias("tb"),
        _pick("purchase", "n_sample").alias("nb"),
    )
    a = sk.where(F.col("event_type") == "view").select(
        "h", F.lit(True).alias("in_a")
    )
    b = sk.where(F.col("event_type") == "purchase").select(
        "h", F.lit(True).alias("in_b")
    )
    m = (
        a.join(b, ["h"], "full")
        .select(
            "h",
            F.coalesce("in_a", F.lit(False)).alias("in_a"),
            F.coalesce("in_b", F.lit(False)).alias("in_b"),
        )
        .crossJoin(F.broadcast(th_wide))
    )
    below = F.col("h") < F.least("ta", "tb")

    def _cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    c = m.groupBy().agg(
        _cnt(below).alias("cnt_union"),
        _cnt(below & F.col("in_a") & F.col("in_b")).alias("cnt_inter"),
        _cnt(below & F.col("in_a") & ~F.col("in_b")).alias("cnt_anotb"),
        _cnt(below & F.col("in_b") & ~F.col("in_a")).alias("cnt_bnota"),
        F.max("ta").alias("ta"),
        F.max("na").alias("na"),
        F.max("tb").alias("tb"),
        F.max("nb").alias("nb"),
    )
    theta = F.least("ta", "tb")
    cnt_a = F.when(F.col("na") == KMV_K, F.lit(KMV_K - 1)).otherwise(
        F.col("na")
    )
    cnt_b = F.when(F.col("nb") == KMV_K, F.lit(KMV_K - 1)).otherwise(
        F.col("nb")
    )
    return c.select(
        kmv_est_micro(cnt_a, F.col("ta")).alias("view_users_micro"),
        kmv_est_micro(cnt_b, F.col("tb")).alias("purchase_users_micro"),
        kmv_est_micro(F.col("cnt_union"), theta).alias("either_users_micro"),
        kmv_est_micro(F.col("cnt_inter"), theta).alias("both_users_micro"),
        kmv_est_micro(F.col("cnt_anotb"), theta).alias(
            "view_only_users_micro"
        ),
        kmv_est_micro(F.col("cnt_bnota"), theta).alias(
            "purchase_only_users_micro"
        ),
        F.col("na").alias("view_sample_n"),
        F.col("nb").alias("purchase_sample_n"),
    )


# Literal mirror of the KMV pipeline: distinct (segment, hash), ranked
# k-smallest samples, thresholds with the complete-sample sentinel
# 2^52, a full-outer sample join, and the same frozen-order estimator
# chain cnt * 2^52 / theta * 1e6 per output column.
AUDIENCE_DIFF_KMV_SQL = """
WITH base AS (
  SELECT DISTINCT event_type AS s,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h
  FROM events
  WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')
),
rk AS (
  SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS rk FROM base
),
sk AS (SELECT s, h FROM rk WHERE rk <= 256),
perseg AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
         CASE WHEN COUNT(*) < 256 THEN CAST(4503599627370496 AS BIGINT)
              ELSE MAX(h) END AS theta
  FROM sk GROUP BY s
),
th AS (
  SELECT MAX(CASE WHEN s = 'view' THEN theta END) AS ta,
         MAX(CASE WHEN s = 'view' THEN n END) AS na,
         MAX(CASE WHEN s = 'purchase' THEN theta END) AS tb,
         MAX(CASE WHEN s = 'purchase' THEN n END) AS nb
  FROM perseg
),
m AS (
  SELECT COALESCE(a.h, b.h) AS h,
         a.h IS NOT NULL AS in_a,
         b.h IS NOT NULL AS in_b
  FROM (SELECT h FROM sk WHERE s = 'view') a
  FULL JOIN (SELECT h FROM sk WHERE s = 'purchase') b ON a.h = b.h
),
c AS (
  SELECT
    CAST(SUM(CASE WHEN h < least(ta, tb) THEN 1 ELSE 0 END) AS BIGINT)
      AS cnt_union,
    CAST(SUM(CASE WHEN h < least(ta, tb) AND in_a AND in_b
             THEN 1 ELSE 0 END) AS BIGINT) AS cnt_inter,
    CAST(SUM(CASE WHEN h < least(ta, tb) AND in_a AND NOT in_b
             THEN 1 ELSE 0 END) AS BIGINT) AS cnt_anotb,
    CAST(SUM(CASE WHEN h < least(ta, tb) AND in_b AND NOT in_a
             THEN 1 ELSE 0 END) AS BIGINT) AS cnt_bnota,
    MAX(ta) AS ta, MAX(na) AS na, MAX(tb) AS tb, MAX(nb) AS nb
  FROM m CROSS JOIN th
)
SELECT
  CAST(round(CAST(CASE WHEN na = 256 THEN 255 ELSE na END AS DOUBLE)
             * 4503599627370496.0 / CAST(ta AS DOUBLE) * 1000000.0)
       AS BIGINT) AS view_users_micro,
  CAST(round(CAST(CASE WHEN nb = 256 THEN 255 ELSE nb END AS DOUBLE)
             * 4503599627370496.0 / CAST(tb AS DOUBLE) * 1000000.0)
       AS BIGINT) AS purchase_users_micro,
  CAST(round(CAST(cnt_union AS DOUBLE)
             * 4503599627370496.0 / CAST(least(ta, tb) AS DOUBLE)
             * 1000000.0) AS BIGINT) AS either_users_micro,
  CAST(round(CAST(cnt_inter AS DOUBLE)
             * 4503599627370496.0 / CAST(least(ta, tb) AS DOUBLE)
             * 1000000.0) AS BIGINT) AS both_users_micro,
  CAST(round(CAST(cnt_anotb AS DOUBLE)
             * 4503599627370496.0 / CAST(least(ta, tb) AS DOUBLE)
             * 1000000.0) AS BIGINT) AS view_only_users_micro,
  CAST(round(CAST(cnt_bnota AS DOUBLE)
             * 4503599627370496.0 / CAST(least(ta, tb) AS DOUBLE)
             * 1000000.0) AS BIGINT) AS purchase_only_users_micro,
  na AS view_sample_n,
  nb AS purchase_sample_n
FROM c
"""


# Per-day variant of the Count-Min mirror — the oracle for the STREAMING
# twin (streaming/stream.py run_streaming_user_freq_cms): counters are
# additive integers, so the update-log reconciliation (max per
# (day, row, bucket)) recovers exactly these batch counters, and the
# deterministic md5 positions make the estimates bit-identical. A day
# exists iff it produced at least one counter row (non-NULL-user event) —
# observedness from counter existence, mirrored by the DISTINCT day scan.
DAILY_CMS_SQL = """
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 14, 13))::BIGINT AS h2
  FROM events WHERE user_id IS NOT NULL
),
counters AS (
  SELECT day, CAST(t.k AS BIGINT) AS row,
         (h1 + CAST(t.k AS BIGINT) * h2) % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM h, range(3) t(k)
  GROUP BY day, CAST(t.k AS BIGINT), (h1 + CAST(t.k AS BIGINT) * h2) % 1024
),
watch AS (
  SELECT CAST(t.k + 1 AS BIGINT) AS user_id,
         ('0x' || substr(md5(CAST(t.k + 1 AS VARCHAR)), 1, 13))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(t.k + 1 AS VARCHAR)), 14, 13))::BIGINT AS h2
  FROM range(10) t(k)
),
days AS (SELECT DISTINCT day FROM counters),
est AS (
  SELECT d.day, w.user_id,
         least(
           COALESCE(c0.cnt, 0),
           COALESCE(c1.cnt, 0),
           COALESCE(c2.cnt, 0)
         ) AS est_cnt
  FROM days d CROSS JOIN watch w
  LEFT JOIN counters c0
    ON c0.day = d.day AND c0.row = 0 AND c0.bucket = (w.h1 + 0 * w.h2) % 1024
  LEFT JOIN counters c1
    ON c1.day = d.day AND c1.row = 1 AND c1.bucket = (w.h1 + 1 * w.h2) % 1024
  LEFT JOIN counters c2
    ON c2.day = d.day AND c2.row = 2 AND c2.bucket = (w.h1 + 2 * w.h2) % 1024
),
tc AS (
  SELECT CAST(ts AS DATE) AS day, user_id,
         CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM events
  WHERE user_id IN (1, 2, 3, 4, 5, 6, 7, 8, 9, 10)
  GROUP BY CAST(ts AS DATE), user_id
)
SELECT e.day, e.user_id, CAST(e.est_cnt AS BIGINT) AS est_cnt,
       COALESCE(t.true_cnt, 0) AS true_cnt
FROM est e LEFT JOIN tc t USING (day, user_id)
"""


QUERIES = {
    "events_value_quantiles_hist": events_value_quantiles_hist,
    "events_audience_overlap_hll": events_audience_overlap_hll,
    "orders_bloom_prune": orders_bloom_prune,
    "events_rolling_quantiles_hist": events_rolling_quantiles_hist,
    "lineitem_distinct_profile_hll": lineitem_distinct_profile_hll,
    "events_user_freq_cms": events_user_freq_cms,
    "events_audience_diff_kmv": events_audience_diff_kmv,
}

ORACLES = {
    "events_user_freq_cms": CMS_USER_FREQ_SQL,
    "events_audience_diff_kmv": AUDIENCE_DIFF_KMV_SQL,
    "lineitem_distinct_profile_hll": DISTINCT_PROFILE_SQL,
    "orders_bloom_prune": BLOOM_PRUNE_SQL,
    "events_rolling_quantiles_hist": ROLLING_HIST_QUANTILES_SQL,
    "events_value_quantiles_hist": HIST_QUANTILES_SQL,
    "events_audience_overlap_hll": AUDIENCE_OVERLAP_SQL,
}
