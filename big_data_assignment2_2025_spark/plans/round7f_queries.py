"""Round-7f queries: sequence pattern matching, containment dedup, and
single-pass observed metrics.

- **sequence pattern match** (``events_pattern_match``): MATCH_RECOGNIZE-
  style row-pattern detection, which Spark SQL lacks as a native operator —
  each (user, day)'s event types compress to a one-letter-per-event symbol
  string in event order, and a regex over the string counts pattern hits
  (here ``vc+p``: view, one-or-more clicks, then purchase — the engaged-
  conversion shape). Blocking on (user, DAY) is what makes it scale: the
  per-group sequence is bounded by one entity-day of events, not stream
  history, so the collect_list state stays small however long the table
  grows (the same bounding discipline as sessionization; an unbounded
  per-user sequence would be the scale-killer). Counting is non-overlapping
  left-to-right in both engines (Java regex and RE2 agree on this), which
  the oracle gate pins.
- **containment dedup** (``dedup_containment``): asymmetric near-dup —
  containment c(A in B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
  catches a short document EMBEDDED in a longer one (quotes, excerpts,
  page-wrappers), which symmetric Jaccard misses because the union is
  dominated by the longer side. Same df-capped inverted-index join as
  ``dedup_ngram_capped`` (the fan-out bound); one extra projection derives
  both directions' scores from the one intersection count.
- **observed metrics** (``orders_observed_profile``): ``DataFrame.observe``
  attaches named aggregate metrics to an existing plan — data-quality
  telemetry (row counts, null rates, extrema) computed IN the same pass as
  the query, zero extra scans. At 100 TB this is the difference between
  free pipeline observability and doubling the read bill; the query result
  is oracle-gated as usual, and the test asserts the observed metrics
  against independent recomputation.

No reference counterpart; LLM-pipeline / observability extensions per
SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import shingles_df
from ..sources.readers import load_table

# --------------------------------------------------------------------------
# 1. Sequence pattern match (MATCH_RECOGNIZE-style)
# --------------------------------------------------------------------------

#: view, one-or-more clicks, then purchase — non-overlapping count
_PATTERN = "vc+p"


def user_day_sequences(ev) -> DataFrame:
    """(user_id, day, seq): each user-day's event types as a one-letter
    symbol string in deterministic (second, event_id) order — the bounded
    per-group sequence every row-pattern/path query builds on."""
    sec = F.floor(F.col("ts").cast("double")).cast("long")
    ord_key = sec * F.lit(10_000_000).cast("long") + F.col("event_id")
    per = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        ord_key.alias("ord"),
        F.substring("event_type", 1, 1).alias("sym"),
    )
    return per.groupBy("user_id", "day").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ord", "sym"))),
                lambda x: x["sym"],
            ),
            "",
        ).alias("seq")
    )


def events_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, day) rows whose event-type sequence matches ``vc+p`` at
    least once, with the non-overlapping match count.

    The symbol string is built from a sorted collect_list over the packed
    (second, event_id) ordinal — a deterministic total order, so both
    engines agree on the sequence byte-for-byte. The groupBy key includes
    the DAY: per-group state is one entity-day of symbols (bounded),
    and the regex evaluates JVM-side inside the aggregate's projection."""
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    seqs = user_day_sequences(ev)
    return (
        seqs.select(
            "user_id",
            "day",
            F.length("seq").cast("long").alias("seq_len"),
            F.regexp_count(F.col("seq"), F.lit(_PATTERN))
            .cast("long")
            .alias("n_matches"),
        )
        .where(F.col("n_matches") >= 1)
        .orderBy("user_id", "day")
    )


EVENTS_PATTERN_MATCH_SQL = f"""
WITH e AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(floor(epoch(ts)) AS BIGINT) * 10000000 + event_id AS ord,
         substring(event_type, 1, 1) AS sym
  FROM events WHERE user_id IS NOT NULL
),
s AS (
  SELECT user_id, day, string_agg(sym, '' ORDER BY ord) AS seq
  FROM e GROUP BY user_id, day
)
SELECT user_id, day,
       CAST(length(seq) AS BIGINT) AS seq_len,
       CAST(len(regexp_extract_all(seq, '{_PATTERN}')) AS BIGINT) AS n_matches
FROM s
WHERE len(regexp_extract_all(seq, '{_PATTERN}')) >= 1
ORDER BY user_id, day
"""


# --------------------------------------------------------------------------
# 2. Containment dedup (asymmetric near-dup)
# --------------------------------------------------------------------------

#: report pairs where either direction's containment reaches this
_C_THRESHOLD = 0.8

#: hot-shingle document-frequency cap (same bound as dedup_ngram_capped)
_DF_CAP = 4


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered pairs with max-direction shingle containment >= 0.8 over
    the df-capped 3-gram universe.

    One inverted-index join produces the intersection count; both
    directions' scores (inter/n1, inter/n2) are derived from it by
    projection — no second join. The df cap bounds the quadratic
    per-shingle fan-out exactly as in dedup_ngram_capped (cap²/2 pairs per
    shingle, worst case)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs, n=3)
    keep = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= _DF_CAP)
        .select("shingle")
    )
    capped = sh.join(keep, "shingle", "left_semi")
    a = capped.select(F.col("doc_id").alias("doc1"), "shingle")
    b = capped.select(F.col("doc_id").alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count("*").alias("inter"))
    )
    sizes = capped.groupBy("doc_id").agg(F.count("*").alias("n"))
    c1 = F.col("inter") / F.col("n1")
    c2 = F.col("inter") / F.col("n2")
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc1"), F.col("n").alias("n1")), "doc1")
        .join(sizes.select(F.col("doc_id").alias("doc2"), F.col("n").alias("n2")), "doc2")
        .where(F.greatest(c1, c2) >= _C_THRESHOLD)
        .select(
            "doc1",
            "doc2",
            "inter",
            "n1",
            "n2",
            F.round(c1, 6).alias("contain_1_in_2"),
            F.round(c2, 6).alias("contain_2_in_1"),
        )
        .orderBy("doc1", "doc2")
    )


DEDUP_CONTAINMENT_SQL = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_'']+') AS toks
      FROM documents WHERE text IS NOT NULL),
tok AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM t),
sh0 AS (SELECT doc_id,
               term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w AS shingle
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sh_all AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
keep AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= {_DF_CAP}),
sh AS (SELECT sh_all.* FROM sh_all JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
SELECT doc1, doc2, inter, s1.n AS n1, s2.n AS n2,
       round(inter / s1.n, 6) AS contain_1_in_2,
       round(inter / s2.n, 6) AS contain_2_in_1
FROM inter
JOIN sizes s1 ON s1.doc_id = doc1
JOIN sizes s2 ON s2.doc_id = doc2
WHERE greatest(inter / s1.n, inter / s2.n) >= {_C_THRESHOLD}
ORDER BY doc1, doc2
"""


# --------------------------------------------------------------------------
# 3. Observed metrics (single-pass data-quality telemetry)
# --------------------------------------------------------------------------


def observed_profile(spark: SparkSession, sf_dir: str):
    """(result DataFrame, Observation) — the observation rides the same
    scan as the aggregate; Observation.get is valid after any action on
    the returned frame. Metrics are counts/extrema only (deterministic;
    a float SUM metric would be partial-order-dependent)."""
    orders = load_table(spark, sf_dir, "orders")
    obs = Observation()
    watched = orders.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("o_custkey").isNull()).alias("n_null_cust"),
        F.min("o_orderdate").alias("min_date"),
        F.max("o_orderdate").alias("max_date"),
    )
    result = (
        watched.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            # exact integer-cents sum, ONE frozen division: a raw double
            # SUM's 4th decimal is partial-order-dependent once the total
            # nears 1e11 (the r11 10x oracle sweep caught exactly that)
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0)
            ).alias("revenue"),
        )
        .orderBy("o_orderstatus")
    )
    return result, obs


def orders_observed_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status order profile with observe()-attached quality metrics
    (row count, null-FK count, date extrema) computed in the SAME pass —
    the zero-extra-scan pipeline-telemetry pattern."""
    result, _ = observed_profile(spark, sf_dir)
    return result


ORDERS_OBSERVED_PROFILE_SQL = """
SELECT o_orderstatus,
       count(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS revenue
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


QUERIES = {
    "events_pattern_match": events_pattern_match,
    "dedup_containment": dedup_containment,
    "orders_observed_profile": orders_observed_profile,
}

ORACLES = {
    "events_pattern_match": EVENTS_PATTERN_MATCH_SQL,
    "dedup_containment": DEDUP_CONTAINMENT_SQL,
    "orders_observed_profile": ORDERS_OBSERVED_PROFILE_SQL,
}
