"""Round-5 queries: operational surfaces a production 100 TB corpus build
runs every day and the registry didn't yet cover —

- **incremental dedup** (``dedup_incremental_batch``): the daily-drop shape.
  A new batch arrives; dedupe it against the already-ingested corpus
  WITHOUT rescanning/re-pairing history: distinct digests of history,
  left-anti join the batch, then keeper-per-digest inside the batch. At
  scale the history side is a digest-only projection (~40 B/row) and the
  join is a shuffle hash join on the digest — never a pair join.
- **argmin/argmax bars** (``events_ohlc_bars``): open/close/high/low per
  (event_type, day) via ``min_by``/``max_by`` with a composite
  deterministic ordering key. One shuffle with map-side partial
  aggregation — the scale-safe alternative to collect_list-and-sort or a
  double window pass. The ordering key is a zero-padded sortable string
  because that is the one composite-key encoding BOTH engines order
  identically (DuckDB's arg_min takes no struct ordering).
- **order-independent table checksum** (``table_checksum_xor``): the
  cross-cluster reconciliation primitive — bit_xor of a 60-bit digest of
  each row's canonical string, grouped. XOR is commutative, so the result
  is independent of partitioning/ordering and two clusters can compare
  per-group fingerprints without moving data. 60 bits (15 hex chars) keeps
  the value inside a signed BIGINT on both engines.
- **corpus divergence** (``corpus_divergence_kl``): per-language add-one
  smoothed KL(A||B) contributions between two hash-split halves of the
  corpus — the drift monitor run between a new training-mix snapshot and
  the previous one.

Later round-5 additions in this module: ``heavy_hitter_terms`` /
``sample_weighted_priority`` (operators/sketches.py), ``events_rolling_dau``
(+ HLL ``_approx`` twin), ``fk_integrity_audit``, and
``events_type_stats_arrow`` (Spark 4 applyInArrow surface).

No counterpart in the reference (index+query only); LLM-pipeline
extensions per SURVEY.md §7.6, each hash-gated against a DuckDB oracle
(since round 7 including the HLL twin, via the deterministic sketch of
``operators/sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens_of
from ..operators.moments import (
    gram_matrix,
    pca2_project,
    pca_project,
    ridge2_fit_predict,
    ridge_fit_predict,
)
from ..operators.sketches import (
    heavy_hitters,
    hll_estimate,
    hll_merge,
    hll_registers,
    weighted_priority_sample,
)
from ..sources.readers import load_table


def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedupe a new document batch (``doc_id % 10 >= 8``) against the
    historical corpus (``doc_id % 10 < 8``) by exact content digest.

    History contributes ONLY ``SELECT DISTINCT md5(text)`` — a digest
    projection that prunes every other column at the scan. The batch is
    left-anti joined on the digest (shuffle hash join; the batch side is
    small, history large — at 100 TB this is the shape where the batch
    could even be broadcast if it fits), then the surviving batch rows are
    reduced to one keeper per digest with the duplicate count."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    hist_digests = (
        docs.where(F.col("doc_id") % 10 < 8)
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    batch = docs.where(F.col("doc_id") % 10 >= 8).select(
        "doc_id", F.md5("text").alias("digest")
    )
    fresh = batch.join(hist_digests, "digest", "left_anti")
    return fresh.groupBy("digest").agg(
        F.min("doc_id").alias("keeper_doc_id"),
        (F.count("*") - F.lit(1)).alias("n_batch_dups"),
    )


DEDUP_INCREMENTAL_SQL = """
WITH hist AS (
  SELECT DISTINCT md5(text) AS digest
  FROM documents WHERE text IS NOT NULL AND doc_id % 10 < 8
),
batch AS (
  SELECT doc_id, md5(text) AS digest
  FROM documents WHERE text IS NOT NULL AND doc_id % 10 >= 8
)
SELECT b.digest,
       MIN(b.doc_id) AS keeper_doc_id,
       COUNT(*) - 1 AS n_batch_dups
FROM batch b
ANTI JOIN hist h ON b.digest = h.digest
GROUP BY b.digest
"""


#: Bias added to epoch-micros before zero-padding: 0001-01-01T00:00:00Z is
#: -62135596800 s, so `micros + BIAS` is non-negative for every proleptic
#: year-1+ timestamp. Without it, "%020d" of a NEGATIVE micros value sorts
#: lexicographically in REVERSE numeric order ('-...2' < '-...1'), and
#: min_by would pick the wrong "open" row on pre-1970 data. Max biased
#: value (year 9999) is ~3.2e17, comfortably inside int64 / 20 digits.
EPOCH_MICROS_BIAS = 62_135_596_800_000_000


#: zero-padded "biased_epoch_micros|event_id" — lexicographic order ==
#: numeric order (both components non-negative by construction), and both
#: engines build the identical string, so min_by/arg_min pick the same row
#: even under timestamp ties.
def _ord_key(ts_micros, event_id):
    return F.format_string(
        "%020d|%012d", ts_micros + F.lit(EPOCH_MICROS_BIAS), event_id
    )


def events_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open/high/low/close bars per (event_type, day): open/close via
    ``min_by``/``max_by`` on a composite deterministic key — a single
    groupBy with map-side partial aggregation (one shuffle of one small
    struct per group per map task). The naive alternatives — sort
    collect_list per group, or two ordered windows — either materialize
    whole groups in memory or sort every row twice; at 100 TB the
    argmin/argmax aggregate is the only shape that stays partial."""
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    key = _ord_key(F.unix_micros("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.date_format("ts", "yyyy-MM-dd").alias("day")
        )
        .agg(
            F.round(F.min_by("value", key), 6).alias("open"),
            F.round(F.max("value"), 6).alias("high"),
            F.round(F.min("value"), 6).alias("low"),
            F.round(F.max_by("value", key), 6).alias("close"),
            F.count("*").alias("n_events"),
        )
    )


OHLC_SQL = """
SELECT event_type,
       strftime(ts, '%Y-%m-%d') AS day,
       round(arg_min(value, printf('%020d|%012d', epoch_us(ts) + 62135596800000000, event_id)), 6) AS open,
       round(max(value), 6) AS high,
       round(min(value), 6) AS low,
       round(arg_max(value, printf('%020d|%012d', epoch_us(ts) + 62135596800000000, event_id)), 6) AS close,
       count(*) AS n_events
FROM events
WHERE value IS NOT NULL
GROUP BY event_type, strftime(ts, '%Y-%m-%d')
"""


def table_checksum_xor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-group fingerprint of ``lineitem``: each row is
    rendered to a canonical string (decimals fixed to 2 places, dates to
    ISO — the one encoding both engines print identically), digested to a
    60-bit integer (15 hex chars of md5 — fits signed BIGINT), and XOR-folded
    per ``l_returnflag``. XOR commutes, so the fingerprint is invariant to
    partitioning, task order, and shuffle nondeterminism — two clusters
    compare ``(group, n_rows, checksum)`` triples instead of rows. This is
    the anti-entropy/reconciliation primitive for replicated 100 TB tables."""
    li = load_table(spark, sf_dir, "lineitem")
    canon = F.concat_ws(
        "|",
        F.col("l_orderkey"),
        F.col("l_linenumber"),
        F.col("l_quantity").cast("decimal(18,2)"),
        F.col("l_extendedprice").cast("decimal(18,2)"),
        F.col("l_discount").cast("decimal(18,2)"),
        F.col("l_returnflag"),
        F.col("l_linestatus"),
        F.date_format("l_shipdate", "yyyy-MM-dd"),
    )
    digest60 = F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")
    return (
        li.select("l_returnflag", digest60.alias("d"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_rows"),
            F.expr("bit_xor(d)").alias("checksum"),
        )
    )


CHECKSUM_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       bit_xor(('0x' || substr(md5(concat_ws('|',
           l_orderkey,
           l_linenumber,
           CAST(l_quantity AS DECIMAL(18,2)),
           CAST(l_extendedprice AS DECIMAL(18,2)),
           CAST(l_discount AS DECIMAL(18,2)),
           l_returnflag,
           l_linestatus,
           strftime(l_shipdate, '%Y-%m-%d'))), 1, 15))::BIGINT) AS checksum
FROM lineitem
GROUP BY l_returnflag
"""


def corpus_divergence_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-distribution drift between two hash-split halves of the
    corpus: per-language add-one smoothed probabilities and the KL(A||B)
    contribution term. All heavy work is one groupBy over (lang); the
    totals + vocabulary size are a 1-row broadcast scalar. Probabilities
    are rounded to 6 decimals BEFORE the log term so both engines compute
    the ratio from identical inputs."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    split = (F.col("doc_id") % 2 == 0).cast("long")
    by_lang = docs.groupBy("lang").agg(
        F.sum(split).alias("n_a"),
        F.sum(1 - split).alias("n_b"),
    )
    totals = by_lang.agg(
        F.sum("n_a").alias("tot_a"),
        F.sum("n_b").alias("tot_b"),
        F.count("*").alias("n_langs"),
    )
    j = by_lang.join(F.broadcast(totals))
    p_a = F.round((F.col("n_a") + 1) / (F.col("tot_a") + F.col("n_langs")), 6)
    p_b = F.round((F.col("n_b") + 1) / (F.col("tot_b") + F.col("n_langs")), 6)
    return j.select(
        "lang",
        "n_a",
        "n_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        F.round(p_a * F.log(p_a / p_b), 6).alias("kl_term"),
    )


DIVERGENCE_SQL = """
WITH by_lang AS (
  SELECT lang,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_b
  FROM documents WHERE text IS NOT NULL
  GROUP BY lang
),
tot AS (
  SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b, COUNT(*) AS n_langs
  FROM by_lang
)
SELECT lang,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       round((n_a + 1) / CAST(tot_a + n_langs AS DOUBLE), 6) AS p_a,
       round((n_b + 1) / CAST(tot_b + n_langs AS DOUBLE), 6) AS p_b,
       round(round((n_a + 1) / CAST(tot_a + n_langs AS DOUBLE), 6)
             * ln(round((n_a + 1) / CAST(tot_a + n_langs AS DOUBLE), 6)
                  / round((n_b + 1) / CAST(tot_b + n_langs AS DOUBLE), 6)), 6)
         AS kl_term
FROM by_lang, tot
"""


def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over the token stream WITHOUT shuffling the full
    vocabulary: ``operators.sketches.heavy_hitters`` (freqItems candidate
    pass -> one exact verification aggregate whose group key folds
    non-candidates into a NULL bucket, so counts AND the grand total come
    from the same scan). The result is bit-equal to the full
    ``GROUP BY ... HAVING`` oracle, but the only keys that ever shuffle
    are the <=1/support candidates (+1 bucket) — at 100 TB the difference
    between shuffling a 1e9-term vocabulary and ~100 keys."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    toks = tokens_of(docs.select("text"))
    return heavy_hitters(toks, "term", support=0.01)


HEAVY_HITTERS_SQL = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_'']+')) AS term
  FROM documents WHERE text IS NOT NULL
),
tot AS (SELECT COUNT(*) AS n_total FROM tok)
SELECT term, COUNT(*) AS cnt, (SELECT n_total FROM tot) AS n_total
FROM tok
GROUP BY term
HAVING COUNT(*) > 0.01 * (SELECT n_total FROM tot)
"""


def sample_weighted_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-biased deterministic document sample: 100 docs with the
    smallest ``hash52(doc_id)/n_chars`` priority (longer docs likelier).
    Top-k compiles to TakeOrderedAndProject — per-partition heaps, no
    global sort — and the priority needs no RNG/seed: any engine replays
    the identical sample from the data alone."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    # priority is bit-identical cross-engine (two exact IEEE divisions of
    # hash-derived integers) — no rounding, unlike order-dependent float sums
    return weighted_priority_sample(docs, "doc_id", "n_chars", 100)


WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, n_chars,
       (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
        / 4503599627370496.0) / n_chars AS priority
FROM documents
WHERE n_chars > 0
ORDER BY priority ASC, doc_id ASC
LIMIT 100
"""


def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day (plus same-day DAU).

    Distinct does NOT decompose into partial aggregates, so a sliding
    distinct cannot reuse the windowed-count trick
    (``events_sliding_window``). The exact scale shape: reduce facts to
    the (day, user) DIMENSION first (one distinct shuffle of the fact
    table — unavoidable), then fan each dimension row out to the <=7
    window-end days it contributes to (a projection, bounded by the
    window length) and run one distinct-agg shuffle over the fan-out.
    Shuffle volume is 7 x daily-active rows, never 7 x events. The
    approximate path at extreme scale is HLL sketch merge
    (``approx_count_distinct`` per day + merge), which IS decomposable —
    this query is the exact form. Output days are restricted to observed
    event days (no trailing phantom windows)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    # dau1 straight off the dimension (rows are already (day,user)-distinct
    # -> a plain count, no second distinct); dau7 over the fan-out as its
    # OWN single-distinct aggregate. Two countDistincts in one agg would
    # compile to an Expand that doubles every fan-out row before the
    # shuffle — splitting them and joining the two per-day frames halves
    # the shuffled volume.
    dau1 = daily.groupBy("day").agg(F.count("*").alias("dau1"))
    contrib = daily.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "win_day"
        ),
        "user_id",
    )
    dau7 = (
        contrib.distinct()
        .groupBy("win_day")
        .agg(F.count("*").alias("dau7"))
        .select(F.col("win_day").alias("day"), "dau7")
    )
    return dau1.join(dau7, "day").select("day", "dau1", "dau7")


ROLLING_DAU_SQL = """
WITH daily AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
contrib AS (
  SELECT day + CAST(t.k AS INTEGER) AS win_day, CAST(t.k AS INTEGER) AS k, user_id
  FROM daily, range(7) t(k)
),
obs AS (SELECT DISTINCT day AS win_day FROM daily)
SELECT c.win_day AS day,
       COUNT(DISTINCT CASE WHEN c.k = 0 THEN c.user_id END) AS dau1,
       COUNT(DISTINCT c.user_id) AS dau7
FROM contrib c JOIN obs USING (win_day)
GROUP BY c.win_day
"""


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: one row per
    foreign key with child row count and orphan count. Each check is one
    left join against the DISTINCT parent key (AQE broadcasts the key
    projections that fit) + one partial-aggregating pass — no scalar
    cross joins, no driver-side counts. The cross-table data-quality
    gate a 100 TB warehouse runs after every load."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    def check(name, child, child_key, parent, parent_key):
        pk = parent.select(F.col(parent_key).alias("__k")).distinct().withColumn(
            "__hit", F.lit(1)
        )
        j = child.select(F.col(child_key).alias("__k")).join(pk, "__k", "left")
        return j.agg(
            F.lit(name).alias("fk"),
            F.count("*").alias("n_child"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0)).alias(
                "n_orphans"
            ),
        )

    checks = [
        check("lineitem.l_orderkey->orders", li, "l_orderkey", orders, "o_orderkey"),
        check("orders.o_custkey->customer", orders, "o_custkey", cust, "c_custkey"),
        check("customer.c_nationkey->nation", cust, "c_nationkey", nation, "n_nationkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


FK_AUDIT_SQL = """
SELECT 'lineitem.l_orderkey->orders' AS fk,
       COUNT(*) AS n_child,
       CAST(SUM(CASE WHEN p.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphans
FROM lineitem c
LEFT JOIN (SELECT DISTINCT o_orderkey AS __k FROM orders) p ON c.l_orderkey = p.__k
UNION ALL
SELECT 'orders.o_custkey->customer',
       COUNT(*),
       CAST(SUM(CASE WHEN p.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders c
LEFT JOIN (SELECT DISTINCT c_custkey AS __k FROM customer) p ON c.o_custkey = p.__k
UNION ALL
SELECT 'customer.c_nationkey->nation',
       COUNT(*),
       CAST(SUM(CASE WHEN p.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM customer c
LEFT JOIN (SELECT DISTINCT n_nationkey AS __k FROM nation) p ON c.c_nationkey = p.__k
"""



def events_rolling_dau_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch twin of ``events_rolling_dau``, built on the
    DETERMINISTIC HyperLogLog of ``operators/sketches.py`` (md5-carved
    52-bit hash, 512 registers) instead of Spark's engine-opaque
    ``approx_count_distinct`` — same HLL++ family, but the registers are
    reproducible from the data alone, so the query is value-verifiable
    cross-engine (hash-gated oracle) where the built-in never could be.

    This is the decomposable path for EXTREME scale, and the plan shows
    it: facts reduce to per-day registers FIRST (map-side-partial max,
    <= days x 512 rows out of the scan — independent of user count),
    the bounded 7-day fan-out then replicates REGISTERS, not users, and
    the window merge is another partial max. Total shuffle is
    O(days x 512) rows whatever the event volume — compare the exact
    twin's 7 x daily-active rows. Emits the raw estimator plus the
    (v_empty, reg_sum) sketch state; the ln-based small-range correction
    is a driver-side post-step (see ``hll_estimate``). Days observed only
    through NULL user_ids carry an empty window sketch and are emitted by
    neither engine (the raw estimator is degenerate on an empty sketch)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(F.to_date("ts").alias("day"), "user_id")
    day_reg = hll_registers(base, ["day"], "user_id")
    fan = day_reg.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "win_day"
        ),
        "bucket",
        "r",
    )
    observed = ev.select(F.to_date("ts").alias("win_day")).distinct()
    win_reg = hll_merge(fan.join(observed, "win_day"), ["win_day"])
    return hll_estimate(win_reg, ["win_day"], out_col="dau7_hll_micro").select(
        F.col("win_day").alias("day"), "v_empty", "reg_sum", "dau7_hll_micro"
    )


# Literal SQL mirror of hll_registers/hll_merge/hll_estimate: same 52-bit
# md5 hash, same integer register algebra, same frozen-order IEEE estimate
# chain (((alpha * m) * m) * 2^44 / S) * 1e6 — bit-identical by
# construction (operators/sketches.py docstrings).
HLL_ROLLING_DAU_SQL = """
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))::BIGINT AS hv
  FROM events WHERE user_id IS NOT NULL
),
br AS (
  SELECT day, hv % 512 AS bucket,
         CASE WHEN (hv >> 9) = 0 THEN 44
              ELSE 44 - length(bin(hv >> 9)) END AS rho
  FROM h
),
day_reg AS (SELECT day, bucket, MAX(rho) AS r FROM br GROUP BY day, bucket),
fan AS (
  SELECT day + CAST(t.k AS INTEGER) AS win_day, bucket, r
  FROM day_reg, range(7) t(k)
),
obs AS (SELECT DISTINCT CAST(ts AS DATE) AS win_day FROM events),
win_reg AS (
  SELECT f.win_day, f.bucket, MAX(f.r) AS r
  FROM fan f JOIN obs USING (win_day)
  GROUP BY f.win_day, f.bucket
),
agg AS (
  SELECT win_day,
         CAST(512 - COUNT(*) AS BIGINT) AS v_empty,
         CAST(CAST(SUM(CAST(1 AS BIGINT) << (44 - r)) AS BIGINT)
              + (512 - COUNT(*)) * 17592186044416 AS BIGINT) AS reg_sum
  FROM win_reg GROUP BY win_day
)
SELECT win_day AS day, v_empty, reg_sum,
       CAST(round((0.7213 / (1.0 + 1.079 / 512.0)) * 512.0 * 512.0
                  * 17592186044416.0 / CAST(reg_sum AS DOUBLE) * 1000000.0)
            AS BIGINT) AS dau7_hll_micro
FROM agg
"""



def events_type_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 ``applyInArrow`` surface (FlatMapGroupsInArrow): per-type
    integer-exact value stats computed in pure pyarrow compute — no pandas
    conversion on either side of the boundary, one Arrow batch per group.
    Grouped-map is sanctioned here because the group domain is BOUNDED
    (5 event types) and each group's batch is a column slice, not Python
    rows. Micros are rounded half-away-from-zero to match DuckDB/Spark
    ``round``, so the oracle is hash-exact."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())

    def stats(table: pa.Table) -> pa.Table:
        et = table.column("event_type")[0].as_py()
        micros = pc.cast(
            pc.round(
                pc.multiply(table.column("value"), pa.scalar(1e6)),
                0,
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table(
            {
                "event_type": [et],
                "n_events": [table.num_rows],
                "sum_micros": [pc.sum(micros).as_py()],
                "min_micros": [pc.min(micros).as_py()],
                "max_micros": [pc.max(micros).as_py()],
            }
        )

    return ev.select("event_type", "value").groupBy("event_type").applyInArrow(
        stats,
        schema="event_type string, n_events long, sum_micros long, "
        "min_micros long, max_micros long",
    )



def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact integer Gram matrix of the 64-dim embedding corpus via
    ``operators.moments.gram_matrix``: one vectorized numpy partial per
    Arrow batch (BLAS ``M.T @ M``), d(d+1)/2 = 2,080 partial entries per
    batch on the wire instead of 2,080 rows PER VECTOR — shuffle is
    O(batches x d^2), independent of corpus size. The moment matrix is
    the one-pass sufficient statistic for PCA/ridge/whitening; the oracle
    spells the same sums via the naive explode."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    return gram_matrix(emb, "embedding")



def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Principal-component scores per embedding, HASH-GATED (r6 verdict
    task 5): the 2-feature closed-form member of the PCA family
    (``operators.moments.pca2_project`` — exact integer moment entries,
    frozen-order IEEE eigensystem, sign-fixed eigenvectors, micro-rounded
    BIGINT scores), which PCA2_SQL replays bit for bit in DuckDB. The
    general-d LAPACK path (``pca_project``, 64 dims) stays the engine API
    for real corpora and keeps its invariant tests — eigh is the one step
    no SQL oracle can reproduce exactly."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    return pca2_project(emb, "embedding")



def embedding_ridge_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge fit of ``label`` scored over the corpus, HASH-GATED (r6
    verdict task 5): the 2-feature closed-form member of the ridge family
    (``operators.moments.ridge2_fit_predict`` — augmented exact-integer
    Gram statistics, Cramer 3x3 solve in a frozen cofactor order,
    micro-rounded BIGINT predictions), which RIDGE2_SQL replays bit for
    bit in DuckDB. The general-d LAPACK path (``ridge_fit_predict``,
    65x65 system) stays the engine API and keeps its fit-quality tests —
    the large solve is the one step no SQL oracle reproduces exactly."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & F.col("label").isNotNull()
    )
    return ridge2_fit_predict(emb, "embedding", "label")



def events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency profile of the view->purchase funnel.

    Chosen definition (deliberate, one-pass): per user, latency =
    GLOBAL first purchase - global first view, counted only when the
    first purchase is at-or-after the first view. A user who purchased
    BEFORE their first view and again after is therefore EXCLUDED, not
    measured from the later purchase — "first purchase at-or-after
    first_view" is a conditional-on-another-aggregate min that cannot be
    expressed in a single partial-aggregating pass; the two-pass
    (join-back) spelling would double the fact-table shuffles for a
    definition difference that only shows on re-purchasers. The oracle
    encodes the same definition. Latencies are exact integer
    MICROSECONDS end-to-end (truncated-seconds vs rounded-epoch was a
    measured cross-engine mismatch). One groupBy on user_id (conditional
    min aggregates — partial, no window) then one tiny percentile
    aggregate over the converted-user dimension. Spark ``percentile`` ==
    DuckDB ``quantile_cont`` (linear interpolation), the established
    parity pair from percentile_stats."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias(
            "first_purchase"
        ),
    )
    conv = firsts.where(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select((F.col("first_purchase") - F.col("first_view")).alias("lat"))
    return conv.agg(
        F.count("*").alias("n_converted"),
        F.round(F.expr("percentile(lat, 0.5)"), 4).alias("p50_us"),
        F.round(F.expr("percentile(lat, 0.9)"), 4).alias("p90_us"),
        F.max("lat").alias("max_us"),
    )


QUERIES = {
    "events_rolling_dau": events_rolling_dau,
    "events_rolling_dau_approx": events_rolling_dau_approx,
    "events_type_stats_arrow": events_type_stats_arrow,
    "embedding_gram_matrix": embedding_gram_matrix,
    "embedding_pca_project": embedding_pca_project,
    "embedding_ridge_label": embedding_ridge_label,
    "events_funnel_latency": events_funnel_latency,
    "fk_integrity_audit": fk_integrity_audit,
    "dedup_incremental_batch": dedup_incremental_batch,
    "heavy_hitter_terms": heavy_hitter_terms,
    "sample_weighted_priority": sample_weighted_priority,
    "events_ohlc_bars": events_ohlc_bars,
    "table_checksum_xor": table_checksum_xor,
    "corpus_divergence_kl": corpus_divergence_kl,
}

ARROW_STATS_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micros,
       MIN(CAST(round(value * 1e6) AS BIGINT)) AS min_micros,
       MAX(CAST(round(value * 1e6) AS BIGINT)) AS max_micros
FROM events
WHERE value IS NOT NULL
GROUP BY event_type
"""


GRAM_SQL = """
WITH idx AS (SELECT CAST(k AS INTEGER) + 1 AS i FROM range(64) t(k)),
pairs AS (SELECT a.i AS i, b.i AS j FROM idx a JOIN idx b ON a.i <= b.i)
SELECT p.i, p.j,
       CAST(SUM(CAST(round(embedding[p.i] * 1e6) AS BIGINT)
                * CAST(round(embedding[p.j] * 1e6) AS BIGINT)) AS BIGINT) AS s
FROM embeddings, pairs p
WHERE embedding IS NOT NULL
GROUP BY p.i, p.j
"""


# Literal SQL mirror of operators.moments._eig2 + pca2_project: identical
# IEEE exact-rounded ops in the identical order on identical doubles ->
# bit-identical eigenvectors and micro-rounded scores. Change together.
PCA2_SQL = """
WITH g AS (
  SELECT CAST(CAST(SUM(x1*x1) AS BIGINT) AS DOUBLE) AS a,
         CAST(CAST(SUM(x1*x2) AS BIGINT) AS DOUBLE) AS b,
         CAST(CAST(SUM(x2*x2) AS BIGINT) AS DOUBLE) AS c
  FROM (
    SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS x1,
           CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT) AS x2
    FROM embeddings WHERE embedding IS NOT NULL
  )
),
eig AS (
  SELECT a, b, c,
         ((a + c) + sqrt((a - c)*(a - c) + 4.0*(b*b))) / 2.0 AS l1
  FROM g
),
u AS (
  SELECT CASE WHEN b <> 0.0 THEN b WHEN a >= c THEN 1.0 ELSE 0.0 END AS ux,
         CASE WHEN b <> 0.0 THEN l1 - a WHEN a >= c THEN 0.0 ELSE 1.0 END AS uy
  FROM eig
),
v AS (
  SELECT ux / sqrt(ux*ux + uy*uy) AS vx0,
         uy / sqrt(ux*ux + uy*uy) AS vy0
  FROM u
),
s1 AS (
  SELECT CASE WHEN (CASE WHEN abs(vx0) >= abs(vy0) THEN vx0 ELSE vy0 END) < 0.0
              THEN -vx0 ELSE vx0 END AS v1x,
         CASE WHEN (CASE WHEN abs(vx0) >= abs(vy0) THEN vx0 ELSE vy0 END) < 0.0
              THEN -vy0 ELSE vy0 END AS v1y
  FROM v
),
s2 AS (
  SELECT v1x, v1y,
         CASE WHEN (CASE WHEN abs(-v1y) >= abs(v1x) THEN -v1y ELSE v1x END) < 0.0
              THEN v1y ELSE -v1y END AS v2x,
         CASE WHEN (CASE WHEN abs(-v1y) >= abs(v1x) THEN -v1y ELSE v1x END) < 0.0
              THEN -v1x ELSE v1x END AS v2y
  FROM s1
)
SELECT e.vec_id, e.label,
       CAST(round((s2.v1x * CAST(e.embedding[1] AS DOUBLE)
                   + s2.v1y * CAST(e.embedding[2] AS DOUBLE)) * 1e6) AS BIGINT)
         AS pc1_micros,
       CAST(round((s2.v2x * CAST(e.embedding[1] AS DOUBLE)
                   + s2.v2y * CAST(e.embedding[2] AS DOUBLE)) * 1e6) AS BIGINT)
         AS pc2_micros
FROM embeddings e, s2
WHERE e.embedding IS NOT NULL
"""


# Literal SQL mirror of operators.moments._det3 + ridge2_fit_predict:
# Cramer's rule with a frozen cofactor-expansion order over exact-integer
# augmented-Gram statistics. Change together.
RIDGE2_SQL = """
WITH m0 AS (
  SELECT CAST(round(CAST(embedding[1] AS DOUBLE) * 1e6) AS BIGINT) AS x1,
         CAST(round(CAST(embedding[2] AS DOUBLE) * 1e6) AS BIGINT) AS x2,
         CAST(1000000 AS BIGINT) AS xc,
         CAST(round(CAST(label AS DOUBLE) * 1e6) AS BIGINT) AS xy
  FROM embeddings WHERE embedding IS NOT NULL AND label IS NOT NULL
),
g AS (
  SELECT CAST(CAST(SUM(x1*x1) AS BIGINT) AS DOUBLE)/1e12 + 0.001 AS m11,
         CAST(CAST(SUM(x1*x2) AS BIGINT) AS DOUBLE)/1e12 AS m12,
         CAST(CAST(SUM(x1*xc) AS BIGINT) AS DOUBLE)/1e12 AS m13,
         CAST(CAST(SUM(x2*x2) AS BIGINT) AS DOUBLE)/1e12 + 0.001 AS m22,
         CAST(CAST(SUM(x2*xc) AS BIGINT) AS DOUBLE)/1e12 AS m23,
         CAST(CAST(SUM(xc*xc) AS BIGINT) AS DOUBLE)/1e12 AS m33,
         CAST(CAST(SUM(x1*xy) AS BIGINT) AS DOUBLE)/1e12 AS r1,
         CAST(CAST(SUM(x2*xy) AS BIGINT) AS DOUBLE)/1e12 AS r2,
         CAST(CAST(SUM(xc*xy) AS BIGINT) AS DOUBLE)/1e12 AS r3
  FROM m0
),
w AS (
  SELECT (m11*(m22*m33 - m23*m23) - m12*(m12*m33 - m23*m13)
          + m13*(m12*m23 - m22*m13)) AS det,
         (r1*(m22*m33 - m23*m23) - m12*(r2*m33 - m23*r3)
          + m13*(r2*m23 - m22*r3)) AS d1,
         (m11*(r2*m33 - m23*r3) - r1*(m12*m33 - m23*m13)
          + m13*(m12*r3 - r2*m13)) AS d2,
         (m11*(m22*r3 - r2*m23) - m12*(m12*r3 - r2*m13)
          + r1*(m12*m23 - m22*m13)) AS d3
  FROM g
),
coef AS (SELECT d1/det AS w1, d2/det AS w2, d3/det AS w0 FROM w)
SELECT e.vec_id, e.label,
       CAST(round(((c.w1 * CAST(e.embedding[1] AS DOUBLE)
                    + c.w2 * CAST(e.embedding[2] AS DOUBLE)) + c.w0) * 1e6)
            AS BIGINT) AS pred_micros
FROM embeddings e, coef c
WHERE e.embedding IS NOT NULL AND e.label IS NOT NULL
"""


FUNNEL_LATENCY_SQL = """
WITH firsts AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
         MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_purchase
  FROM events GROUP BY user_id
),
conv AS (
  SELECT first_purchase - first_view AS lat
  FROM firsts
  WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
    AND first_purchase >= first_view
)
SELECT COUNT(*) AS n_converted,
       round(quantile_cont(lat, 0.5), 4) AS p50_us,
       round(quantile_cont(lat, 0.9), 4) AS p90_us,
       MAX(lat) AS max_us
FROM conv
"""


ORACLES = {
    "events_funnel_latency": FUNNEL_LATENCY_SQL,
    "embedding_gram_matrix": GRAM_SQL,
    "embedding_pca_project": PCA2_SQL,
    "embedding_ridge_label": RIDGE2_SQL,
    "events_type_stats_arrow": ARROW_STATS_SQL,
    "events_rolling_dau": ROLLING_DAU_SQL,
    "events_rolling_dau_approx": HLL_ROLLING_DAU_SQL,
    "fk_integrity_audit": FK_AUDIT_SQL,
    "dedup_incremental_batch": DEDUP_INCREMENTAL_SQL,
    "heavy_hitter_terms": HEAVY_HITTERS_SQL,
    "sample_weighted_priority": WEIGHTED_SAMPLE_SQL,
    "events_ohlc_bars": OHLC_SQL,
    "table_checksum_xor": CHECKSUM_SQL,
    "corpus_divergence_kl": DIVERGENCE_SQL,
}
