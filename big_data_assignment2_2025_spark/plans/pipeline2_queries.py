"""Training-data-pipeline operators, second batch (round 2): document
chunking with overlap, repetition-based quality stats (Gopher-style), an
embedding-outlier sweep against per-label centroids, integer-exact
winsorized robust statistics, normalized-prefix dedup, and per-label class
rebalancing — the corpus-preparation steps between raw ingest and training
batches that the first pipeline batch (plans/pipeline_queries.py) did not
cover.

Determinism contract: identical to plans/relational.py — every aggregate
that feeds a comparison or a sum is first made integer-exact (token counts,
value cents, embedding micros), float division/rounding happens once at the
very end with identical IEEE op sequences on both engines, md5 is the only
hash, and every DuckDB integer SUM is CAST(... AS BIGINT) (HUGEINT reaches
the driver as float otherwise).

Reference parity: the reference's pipeline surface is tokenize→index→rank
(app/mapreduce/mapper1.py:18, app/query.py:131-143); everything here is a
driver-mandated training-pipeline extension built from the same Spark
primitives (explode/groupBy/window/join — zero Python UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators.chunking import chunk_documents
from ..sources.readers import load_table


# ---------------------------------------------------------------------------
# Document chunking (fixed window, overlapping stride)
# ---------------------------------------------------------------------------

def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-token chunks every 24 tokens (8-token overlap) over the corpus.
    The explode fans out partition-locally — no shuffle at all in this plan;
    the md5 chunk hash is the portable unit for downstream chunk dedup."""
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs, window=32, stride=24).orderBy(
        "doc_id", "chunk_id"
    )


DOC_CHUNK_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, toks, len(toks) AS n,
         unnest(range(1, len(toks) + 1, 24)) AS start
  FROM t)
SELECT doc_id,
       CAST((start - 1) / 24 AS BIGINT) AS chunk_id,
       CAST(least(32, n - start + 1) AS BIGINT) AS chunk_len,
       md5(array_to_string(toks[start:start+31], ' ')) AS chunk_hash
FROM s
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Repetition / diversity quality stats (Gopher-style filters)
# ---------------------------------------------------------------------------

def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals used by quality filters: total
    tokens, distinct-token ratio, most-frequent-token fraction, and the
    resulting keep/drop flag. Two hash aggregations, both partial+final;
    the ratios divide exact BIGINT counts so the doubles are identical on
    both engines."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    per = tok.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    return (
        per.groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("max_c"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("max_c") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
            (F.col("max_c") / F.col("n_tokens") > 0.1).alias("is_repetitive"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
per AS (
  SELECT doc_id, tok, COUNT(*) AS c FROM tok WHERE tok <> ''
  GROUP BY doc_id, tok),
s AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct, MAX(c) AS max_c
  FROM per GROUP BY doc_id)
SELECT doc_id, n_tokens,
       round(n_distinct / n_tokens, 6) AS distinct_ratio,
       round(max_c / n_tokens, 6) AS top_token_frac,
       (max_c / n_tokens > 0.1) AS is_repetitive
FROM s
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Embedding outliers vs per-label centroids (posexplode-relational)
# ---------------------------------------------------------------------------

def embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 farthest vectors from their label centroid, per label — the
    mislabeled-example sweep of an embedding-QA pipeline, done fully
    relationally: posexplode to (vec, dim, value) rows, centroid = per
    (label, dim) mean, distance = exact BIGINT sum of squared micro-unit
    deltas. At 100 TB the (label, dim) centroid table is tiny (labels x
    dims) and broadcasts back into the per-vector distance aggregation;
    the only big shuffle keys on vec_id, which is unique → skew-free.

    Floats are quantized to integer micros (round(val * 1e6)) BEFORE any
    arithmetic: 1e6 has a 5^6 factor, so no float input can land exactly on
    a .5 tie, making the rounding — and every downstream integer sum —
    bit-identical across engines."""
    emb = load_table(spark, sf_dir, "embeddings")
    pe = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "val")
    )
    m = pe.select(
        "vec_id",
        "label",
        "dim",
        F.round(F.col("val").cast("double") * 1e6).cast("long").alias("micros"),
    )
    cent = m.groupBy("label", "dim").agg(
        F.round(F.sum("micros").cast("double") / F.count("*"))
        .cast("long")
        .alias("c_micros")
    )
    delta = F.col("micros") - F.col("c_micros")
    d2 = (
        m.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(F.sum(delta * delta).alias("d2"))
    )
    rk = W.partitionBy("label").orderBy(F.desc("d2"), "vec_id")
    return (
        d2.withColumn("rnk", F.row_number().over(rk))
        .where(F.col("rnk") <= 3)
        .select("label", "vec_id", "d2", "rnk")
        .orderBy("label", "rnk")
    )


EMBEDDING_OUTLIERS_SQL = """
WITH pe AS (
  SELECT vec_id, label,
         generate_subscripts(embedding, 1) - 1 AS dim,
         unnest(embedding) AS val
  FROM embeddings),
m AS (
  SELECT vec_id, label, dim,
         CAST(round(CAST(val AS DOUBLE) * 1e6) AS BIGINT) AS micros
  FROM pe),
cent AS (
  SELECT label, dim,
         CAST(round(CAST(SUM(micros) AS DOUBLE) / COUNT(*)) AS BIGINT)
           AS c_micros
  FROM m GROUP BY label, dim),
d2 AS (
  SELECT vec_id, m.label,
         CAST(SUM((micros - c_micros) * (micros - c_micros)) AS BIGINT) AS d2
  FROM m JOIN cent ON m.label = cent.label AND m.dim = cent.dim
  GROUP BY vec_id, m.label),
r AS (
  SELECT label, vec_id, d2,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY d2 DESC, vec_id) AS rnk
  FROM d2)
SELECT label, vec_id, d2, rnk FROM r WHERE rnk <= 3
ORDER BY label, rnk
"""


# ---------------------------------------------------------------------------
# Winsorized robust statistics (integer-exact, rank-based percentiles)
# ---------------------------------------------------------------------------

def events_winsorized_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean of event value per type: clip to the empirical
    [p05, p95] and average. Percentile bounds are DISCRETE (the element at
    rank ceil(q*n)) rather than interpolated — rank selection over exact
    integer cents is bit-identical on both engines, where interpolation
    arithmetic might differ in the last ulp. The clipped sum is a BIGINT
    sum of cents; the single division happens once at the end."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    byv = W.partitionBy("event_type").orderBy("cents", "event_id")
    ranked = ev.withColumn("rk", F.row_number().over(byv)).withColumn(
        "n", F.count("*").over(W.partitionBy("event_type"))
    )
    bounds = ranked.groupBy("event_type").agg(
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.05), F.col("cents"))
        ).alias("lo_cents"),
        F.max(
            F.when(F.col("rk") == F.ceil(F.col("n") * 0.95), F.col("cents"))
        ).alias("hi_cents"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo_cents",
        "hi_cents",
        F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
        .alias("w_cents"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.first("lo_cents").alias("lo_cents"),
            F.first("hi_cents").alias("hi_cents"),
            F.round(
                F.sum("w_cents").cast("double") / F.count("*"), 4
            ).alias("winsorized_mean_cents"),
        )
        .orderBy("event_type")
    )


EVENTS_WINSORIZED_SQL = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
ranked AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev),
bounds AS (
  SELECT event_type,
         MAX(CASE WHEN rk = CAST(ceil(n * 0.05) AS BIGINT)
                  THEN cents END) AS lo_cents,
         MAX(CASE WHEN rk = CAST(ceil(n * 0.95) AS BIGINT)
                  THEN cents END) AS hi_cents
  FROM ranked GROUP BY event_type)
SELECT ev.event_type, COUNT(*) AS n,
       CAST(MIN(lo_cents) AS BIGINT) AS lo_cents,
       CAST(MIN(hi_cents) AS BIGINT) AS hi_cents,
       round(CAST(SUM(least(greatest(cents, lo_cents), hi_cents)) AS DOUBLE)
             / COUNT(*), 4) AS winsorized_mean_cents
FROM ev JOIN bounds ON ev.event_type = bounds.event_type
GROUP BY ev.event_type
ORDER BY ev.event_type
"""


# ---------------------------------------------------------------------------
# Normalized-prefix dedup (cheap first-pass near-dup filter)
# ---------------------------------------------------------------------------

def dedup_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs sharing the same normalized 24-char prefix (lowercase,
    alphanumerics only) — the O(n) first-pass dedup real pipelines run
    before the expensive MinHash stage (operators/dedup.py). One groupBy on
    the md5 of the prefix; canonical doc = min doc_id per group; only
    multi-doc groups survive."""
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.md5(
        F.substring(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""), 1, 24
        )
    )
    return (
        docs.select(pfx.alias("prefix_hash"), "doc_id")
        .groupBy("prefix_hash")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_id"),
        )
        .where(F.col("n_docs") > 1)
        .orderBy(F.desc("n_docs"), "canonical_id")
    )


DEDUP_PREFIX_SQL = """
SELECT md5(substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 24))
         AS prefix_hash,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS canonical_id
FROM documents
GROUP BY prefix_hash
HAVING COUNT(*) > 1
ORDER BY n_docs DESC, canonical_id
"""


# ---------------------------------------------------------------------------
# Class rebalancing (deterministic per-label downsampling)
# ---------------------------------------------------------------------------

def class_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample every embedding label to the minority-class count using a
    deterministic hash order (md5 of vec_id) — the class-balancing step
    before training a probe/classifier. The min count is a single-row
    aggregate over the tiny per-label counts, broadcast back; the
    row_number window shuffles once on label. At scale, labels are few and
    rows per label are large — the window is the right tool because each
    partition is processed streamingly, no per-label collect."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    counts = emb.groupBy("label").agg(F.count("*").alias("n"))
    min_n = counts.agg(F.min("n").alias("min_n"))
    rk = W.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        emb.withColumn("rk", F.row_number().over(rk))
        .crossJoin(F.broadcast(min_n))
        .where(F.col("rk") <= F.col("min_n"))
        .select("label", "vec_id")
        .orderBy("label", "vec_id")
    )


CLASS_REBALANCE_SQL = """
WITH counts AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY label),
ranked AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (PARTITION BY label
                            ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS rk
  FROM embeddings)
SELECT label, vec_id FROM ranked
WHERE rk <= (SELECT MIN(n) FROM counts)
ORDER BY label, vec_id
"""


# ---------------------------------------------------------------------------
# Snapshot diff (CDC-style table compare)
# ---------------------------------------------------------------------------

def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level diff of two table snapshots — the reconciliation step of
    every replication/backfill pipeline. Old and new snapshots are derived
    deterministically from the orders fixture (disjoint key-suffix deletes
    and inserts, a price bump on every 5th key), then FULL OUTER joined on
    the key and classified insert / delete / update; unchanged rows are
    dropped BEFORE the sort so the output scales with the churn, not the
    table. One co-partitioned shuffle on the key at any scale."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    old = orders.where(F.col("o_orderkey") % 10 != 3)
    new = orders.where(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        F.when(
            F.col("o_orderkey") % 5 == 0, F.col("cents") + 100
        ).otherwise(F.col("cents")).alias("cents"),
    )
    o = old.select(
        F.col("o_orderkey").alias("k"), F.col("cents").alias("old_cents")
    )
    n = new.select(
        F.col("o_orderkey").alias("k"), F.col("cents").alias("new_cents")
    )
    diff = o.join(n, "k", "full_outer").select(
        F.col("k").alias("o_orderkey"),
        F.when(F.col("old_cents").isNull(), F.lit("insert"))
        .when(F.col("new_cents").isNull(), F.lit("delete"))
        .when(F.col("old_cents") != F.col("new_cents"), F.lit("update"))
        .otherwise(F.lit("same"))
        .alias("action"),
        "old_cents",
        "new_cents",
    )
    return diff.where(F.col("action") != "same").orderBy("o_orderkey")


SNAPSHOT_DIFF_SQL = """
WITH base AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
old AS (SELECT * FROM base WHERE o_orderkey % 10 <> 3),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 5 = 0 THEN cents + 100 ELSE cents END AS cents
  FROM base WHERE o_orderkey % 10 <> 7),
diff AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
         CASE WHEN old.o_orderkey IS NULL THEN 'insert'
              WHEN new.o_orderkey IS NULL THEN 'delete'
              WHEN old.cents <> new.cents THEN 'update'
              ELSE 'same' END AS action,
         old.cents AS old_cents, new.cents AS new_cents
  FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey)
SELECT o_orderkey, action, old_cents, new_cents
FROM diff WHERE action <> 'same'
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Incremental aggregate refresh (materialized-view maintenance)
# ---------------------------------------------------------------------------

def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Refresh a materialized monthly-revenue aggregate with a delta batch
    WITHOUT rescanning history: new_agg = re-aggregate(old_agg ∪ agg(delta)).
    The 'old' materialization covers orders before 2001; the delta is the
    2001+ tail. Because SUM and COUNT are decomposable, unioning the small
    aggregate with the aggregated delta and re-summing per group is exact —
    the oracle recomputes from ALL rows and must hash-match. This is the
    generic form of the index builder's incremental_reindex (SURVEY.md A5):
    at 100 TB the refresh touches only the delta partition plus the tiny
    aggregate table."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    cut = F.lit("2001-01-01").cast("date")
    base_agg = (
        orders.where(F.col("month") < cut)
        .groupBy("month")
        .agg(F.sum("cents").alias("rev_cents"), F.count("*").alias("n_orders"))
    )
    delta_agg = (
        orders.where(F.col("month") >= cut)
        .groupBy("month")
        .agg(F.sum("cents").alias("rev_cents"), F.count("*").alias("n_orders"))
    )
    return (
        base_agg.unionByName(delta_agg)
        .groupBy("month")
        .agg(
            F.sum("rev_cents").alias("rev_cents"),
            F.sum("n_orders").alias("n_orders"),
        )
        .orderBy("month")
    )


INCREMENTAL_AGG_SQL = """
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS rev_cents,
       COUNT(*) AS n_orders
FROM orders
GROUP BY month
ORDER BY month
"""


QUERIES = {
    "snapshot_diff": snapshot_diff,
    "incremental_agg_refresh": incremental_agg_refresh,
    "doc_chunk_overlap": doc_chunk_overlap,
    "text_repetition_stats": text_repetition_stats,
    "embedding_outliers": embedding_outliers,
    "events_winsorized_value": events_winsorized_value,
    "dedup_prefix_groups": dedup_prefix_groups,
    "class_rebalance": class_rebalance,
}

ORACLES = {
    "snapshot_diff": SNAPSHOT_DIFF_SQL,
    "incremental_agg_refresh": INCREMENTAL_AGG_SQL,
    "doc_chunk_overlap": DOC_CHUNK_SQL,
    "text_repetition_stats": TEXT_REPETITION_SQL,
    "embedding_outliers": EMBEDDING_OUTLIERS_SQL,
    "events_winsorized_value": EVENTS_WINSORIZED_SQL,
    "dedup_prefix_groups": DEDUP_PREFIX_SQL,
    "class_rebalance": CLASS_REBALANCE_SQL,
}
