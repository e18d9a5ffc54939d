"""Round-4 queries: the distributed-ranking operator generalized beyond RFM,
and an end-to-end training-data mix pipeline (quality gate -> exact-dedup
keeper -> deterministic stratified sampling) — the composite shape a
100 TB pretraining-corpus build actually runs.

No counterpart in the reference (its pipeline is index+query only); these
are LLM-data-pipeline extensions per SURVEY.md §7.6, each hash-gated
against a DuckDB oracle.
"""

# NOTE: no `from __future__ import annotations` here — stringified
# annotations would defeat pandas_udf's type-hint eval-type inference
# (udaf_trimmed_mean), forcing the deprecated PandasUDFType enum instead.
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import quality_score, whitespace_token_count
from ..operators.dedup import hash64
from ..operators.ranking import NtileSpec, with_global_ntiles
from ..sources.readers import load_table

# per-document quality in [0,1], identical to TEXT_QUALITY_SQL's formula
# (text_queries.py) — fixed operation order keeps it bit-equal cross-engine
_QUALITY_CTE = """
t AS (SELECT doc_id, lang, source,
             regexp_extract_all(lower(text), '[a-z0-9_'']+') AS toks, text
      FROM documents WHERE text IS NOT NULL),
m AS (
  SELECT doc_id, lang, source, text,
         round(
           (CASE WHEN CAST(length(text) AS DOUBLE) >= 100
                  AND CAST(length(text) AS DOUBLE) <= 20000 THEN 1.0
                 WHEN length(text) > 0 THEN 0.5 ELSE 0.0 END) * 0.4
           + (CASE WHEN length(text) > 0
                   THEN CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                        / CAST(length(text) AS DOUBLE)
                   ELSE 0.0 END) * 0.3
           + (CASE WHEN len(toks) > 0
                   THEN LEAST(1.0, CAST(len(list_filter(toks,
                        x -> x IN ('the','and','of','to','is','a','in'))) AS DOUBLE)
                        * 10.0 / CAST(len(toks) AS DOUBLE))
                   ELSE 0.0 END) * 0.3,
           6) AS quality
  FROM t)
"""


def doc_quality_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quartile corpus quality profile: documents cut into 4 positional
    quality quartiles (best = 1), then per-quartile doc counts and quality
    bounds — the readout that decides curriculum/sampling weights.

    Exercises ``operators.ranking.with_global_ntiles`` on a DOUBLE metric:
    the ascending long key is the negated micro-unit quality (quality is
    rounded to 6 decimals, so ``round(q*1e6)`` is an exact integer and the
    key is strictly monotone with the quality order). No unpartitioned
    window; the oracle uses plain NTILE."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = docs.select(
        "doc_id", F.round(quality_score("text"), 6).alias("quality")
    )
    tiled = with_global_ntiles(
        scored,
        [
            # quality clusters on the formula's band steps -> composite
            # boundaries keep buckets balanced under heavy ties
            NtileSpec(
                "quartile",
                -F.round(F.col("quality") * 1e6),
                [F.col("quality").desc(), F.col("doc_id").asc()],
                sub_key=F.col("doc_id"),
            )
        ],
        n_tiles=4,
    )
    return (
        tiled.groupBy("quartile")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("quality").alias("min_quality"),
            F.max("quality").alias("max_quality"),
        )
        .orderBy("quartile")
    )


DOC_QUALITY_QUARTILES_SQL = f"""
WITH {_QUALITY_CTE},
d AS (
  SELECT doc_id, quality,
         NTILE(4) OVER (ORDER BY quality DESC, doc_id ASC) AS quartile
  FROM m)
SELECT CAST(quartile AS INTEGER) AS quartile,
       COUNT(*) AS n_docs,
       MIN(quality) AS min_quality,
       MAX(quality) AS max_quality
FROM d GROUP BY quartile ORDER BY quartile
"""


def training_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-mix construction, the composite every pretraining
    corpus build runs: (1) quality gate (score >= 0.5), (2) exact-dedup
    keeper (min doc_id per text digest — ONE row_number window partitioned
    by the digest, no join back), (3) deterministic stratified sampling by
    language (en 80%, es/de/fr 50%, otherwise 25%) via a portable md5-hash
    predicate — reproducible on any engine, unlike seeded RNG sampling.
    Output: per (lang, source) sampled doc counts and whitespace-token
    budget, the numbers a mix planner feeds back into sampling weights.

    Scale shape: one digest-partitioned window (high-cardinality key, no
    skew), every filter is a scan-level projection/predicate, final rollup
    is one small aggregation — three narrow shuffles of the doc DIMENSION
    (digest window, groupBy, output sort), never the text payload twice."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    scored = docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        F.round(quality_score("text"), 6).alias("quality"),
    ).where(F.col("quality") >= 0.5)
    w = Window.partitionBy(F.md5("text")).orderBy(F.col("doc_id").asc())
    keepers = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    rate = (
        F.when(F.col("lang") == "en", F.lit(80))
        .when(F.col("lang").isin("es", "de", "fr"), F.lit(50))
        .otherwise(F.lit(25))
    )
    sampled = keepers.where(
        hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 100
        < rate
    )
    return (
        sampled.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(whitespace_token_count("text").cast("long")).alias(
                "sum_ws_tokens"
            ),
        )
        .orderBy("lang", "source")
    )


TRAINING_MIX_SQL = f"""
WITH {_QUALITY_CTE},
gated AS (SELECT * FROM m WHERE quality >= 0.5),
keeper AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                               ORDER BY doc_id ASC) AS rn
  FROM gated),
samp AS (
  SELECT lang, source, text FROM keeper
  WHERE rn = 1
    AND CAST('0x' || substring(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100
        < (CASE WHEN lang = 'en' THEN 80
                WHEN lang IN ('es','de','fr') THEN 50
                ELSE 25 END))
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS BIGINT)
         AS sum_ws_tokens
FROM samp GROUP BY lang, source ORDER BY lang, source
"""


def doc_boilerplate_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document LINE duplication per document — the boilerplate
    contamination metric corpus prep pipelines filter on (a page whose
    sentences mostly appear verbatim elsewhere is navigation/template, not
    content). Sentences = '. '-separated segments longer than 20 chars;
    a sentence is boilerplate if its exact text occurs in more than one
    DOCUMENT.

    Shape: explode to (doc, sentence) -> md5 the sentence AT EXPLODE TIME
    (inside the same scan-side projection, before any exchange) ->
    distinct -> document-frequency agg -> join back, ALL keyed on the
    32-hex digest. The raw sentence string never crosses a shuffle: every
    exchange row is (doc_id, 32-char digest), fixed-width regardless of
    sentence length — the same digest-key discipline as exact dedup
    (operators/dedup.py). Collisions are a non-issue at any corpus size
    (2^64 birthday bound on 128-bit md5). Output: per-doc sentence counts,
    duplicated-sentence count, and the boilerplate rate (exact integer
    division, rounded once)."""
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    sent = (
        docs.select(
            "doc_id", F.explode(F.split("text", r"\. ")).alias("sentence")
        )
        .where(F.length("sentence") > 20)
        .select("doc_id", F.md5("sentence").alias("sent_digest"))
        .distinct()
    )
    freq = sent.groupBy("sent_digest").agg(F.count("*").alias("n_docs_with"))
    per_doc = (
        sent.join(freq, "sent_digest")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sentences"),
            F.sum(F.when(F.col("n_docs_with") > 1, 1).otherwise(0)).alias(
                "n_boilerplate"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_sentences",
        "n_boilerplate",
        F.round(
            F.col("n_boilerplate").cast("double") / F.col("n_sentences"), 6
        ).alias("boilerplate_rate"),
    )


DOC_BOILERPLATE_SQL = """
WITH sent AS (
  SELECT DISTINCT doc_id, s AS sentence
  FROM (SELECT doc_id, unnest(string_split(text, '. ')) AS s
        FROM documents WHERE text IS NOT NULL)
  WHERE length(s) > 20),
freq AS (SELECT sentence, COUNT(*) AS n_docs_with FROM sent GROUP BY sentence)
SELECT doc_id,
       COUNT(*) AS n_sentences,
       CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boilerplate,
       round(CAST(SUM(CASE WHEN n_docs_with > 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS boilerplate_rate
FROM sent JOIN freq USING (sentence)
GROUP BY doc_id
"""


def training_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into training shards — the
    primitive that turns a curated corpus into a reproducible training
    order. Each document gets a portable pseudo-random key
    (md5 of seed||doc_id — NOT ``rand()``, which re-deals on every re-read)
    and a shard = first key byte mod 64; within a shard the read order is
    the key order. Result: any engine, any partitioning, any re-run
    produces the identical (shard, position) assignment.

    Scale shape: the shard count is the parallelism knob (64 here; at
    100 TB use thousands), the only window is partitioned BY SHARD —
    per-shard sorts of corpus_size/n_shards rows, no global sort, no
    driver state. The rollup readout keeps the gate result small while the
    per-doc assignment is the real product (write `shards` partitioned by
    shard for the trainer)."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    # first md5 byte -> 0..255 via hex-digit position (instr/strpos is the
    # portable cross-engine idiom; conv()/from_hex() differ between engines)
    hexdig = "0123456789abcdef"
    shards = docs.select(
        "doc_id",
        "n_chars",
        key.alias("k"),
    ).withColumn(
        "shard",
        (
            (F.expr(f"instr('{hexdig}', substring(k, 1, 1)) - 1") * 16
             + F.expr(f"instr('{hexdig}', substring(k, 2, 1)) - 1"))
            % 64
        ).cast("long"),
    )
    w = Window.partitionBy("shard").orderBy("k", "doc_id")
    assigned = shards.withColumn("pos", F.row_number().over(w))
    return (
        assigned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.max("pos").alias("max_pos"),
            F.min("k").alias("first_key"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("shard")
    )


TRAINING_SHUFFLE_SQL = """
WITH s AS (
  SELECT doc_id, n_chars,
         md5('seed42:' || CAST(doc_id AS VARCHAR)) AS k
  FROM documents),
a AS (
  SELECT doc_id, n_chars, k,
         CAST(((strpos('0123456789abcdef', substring(k, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substring(k, 2, 1)) - 1)) % 64
              AS BIGINT) AS shard
  FROM s),
p AS (
  SELECT shard, n_chars, k,
         ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS pos
  FROM a)
SELECT shard, COUNT(*) AS n_docs, CAST(MAX(pos) AS BIGINT) AS max_pos,
       MIN(k) AS first_key, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM p GROUP BY shard ORDER BY shard
"""


def udaf_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF surface (``pandas_udf`` GROUPED_AGG): a per-event-type
    10%-trimmed mean — the robust-location aggregate built-ins don't ship.
    The UDF receives each group's values as ONE Arrow-backed numpy array
    (vectorized; PythonUDAF in the plan, never row-at-a-time), and all
    arithmetic is integer cents with a single floor division, so the result
    is bit-exact across engines and partitionings. Python's ``//`` floors;
    the oracle mirrors it with ``floor(sum/cnt)`` in double (the sum is
    far below 2^53, so the double division is exact) — robust even if a
    regenerated fixture ships negative values, where DuckDB's integer
    ``//`` (truncating) would diverge.

    Scale note: GROUPED_AGG materializes each group's values in executor
    memory — fine for bounded groups (event types); for unbounded groups
    the rank-filtered SQL form (the oracle's shape) is the scale path.
    This query pins the API surface, like udtf_top_terms.

    Single pass: Spark disallows mixing a GROUPED_AGG pandas UDF with
    native aggregates in one ``agg()``, but multiple GROUPED_AGG UDFs
    compose — so the group count rides along as a second vectorized UDAF
    over the same Arrow batch (one shuffle, no join-back). Eval type is
    inferred from the ``pd.Series -> int`` hints (the non-deprecated
    Spark 3/4 API); this module deliberately has no
    ``from __future__ import annotations``."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _trimmed(cents: pd.Series) -> int:
        v = cents.sort_values().to_numpy()
        k = len(v) // 10
        kept = v[k : len(v) - k] if len(v) > 2 * k else v
        return int(kept.sum()) // len(kept)

    def _size(cents: pd.Series) -> int:
        return len(cents)

    trimmed_mean_cents = pandas_udf(_trimmed, "long")
    group_size = pandas_udf(_size, "long")

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    cents = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    return (
        cents.groupBy("event_type")
        .agg(
            group_size("cents").alias("n_events"),
            trimmed_mean_cents("cents").alias("trimmed_mean_cents"),
        )
        .orderBy("event_type")
    )


UDAF_TRIMMED_MEAN_SQL = """
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n_events,
       CAST(floor(CAST(SUM(CASE WHEN rn > n // 10 AND rn <= n - n // 10
                             THEN cents END) AS DOUBLE)
                  / (MAX(n) - 2 * (MAX(n) // 10))) AS BIGINT)
         AS trimmed_mean_cents
FROM r GROUP BY event_type ORDER BY event_type
"""


def null_semantics_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential NULL-semantics probe — the classic cross-engine
    divergence area, pinned as one hash-gated summary row. Derives NULLs
    from the customer table (every 7th nation key, negative balances) and
    checks, in one pass plus two bounded self-joins:
    - COUNT(*) vs COUNT(col) vs COUNT(DISTINCT col) null exclusion,
    - GROUP BY collapsing all NULL keys into ONE group,
    - inner equi-join dropping NULL keys entirely,
    - null-safe equality (Spark ``<=>`` / SQL IS NOT DISTINCT FROM)
      matching NULL to NULL,
    - SUM/AVG ignoring NULLs (integer cents, one rounded division).
    The joins are on a 25-value key domain — bounded; the final assembly
    cross-joins three 1-row aggregates (whitelisted scalars)."""
    cust = load_table(spark, sf_dir, "customer")
    t = cust.select(
        "c_custkey",
        F.when(F.col("c_nationkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
        F.when(
            F.col("c_acctbal") < 0, F.lit(None).cast("long")
        )
        .otherwise(F.round(F.col("c_acctbal") * 100).cast("long"))
        .alias("bal_cents"),
    )
    base = t.agg(
        F.count("*").alias("n_rows"),
        F.count("nk").alias("n_nk_notnull"),
        F.countDistinct("nk").alias("n_nk_distinct"),
        (F.countDistinct("nk") + F.max(F.col("nk").isNull().cast("long"))).alias(
            "n_groups_incl_null"
        ),
        F.sum("bal_cents").alias("sum_bal_cents"),
        F.count(F.when(F.col("bal_cents").isNull(), 1)).alias("n_bal_null"),
    )
    a = t.select(F.col("nk").alias("k1"))
    b = t.select(F.col("nk").alias("k2"))
    inner = a.join(b, a.k1 == b.k2).agg(
        F.count("*").alias("inner_join_rows")
    )
    nullsafe = a.join(b, a.k1.eqNullSafe(b.k2)).agg(
        F.count("*").alias("nullsafe_join_rows")
    )
    return base.crossJoin(F.broadcast(inner)).crossJoin(
        F.broadcast(nullsafe)
    )


NULL_SEMANTICS_SQL = """
WITH t AS (
  SELECT c_custkey,
         CASE WHEN c_nationkey % 7 = 0 THEN NULL ELSE c_nationkey END AS nk,
         CASE WHEN c_acctbal < 0 THEN NULL
              ELSE CAST(round(c_acctbal * 100) AS BIGINT) END AS bal_cents
  FROM customer),
base AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(nk) AS n_nk_notnull,
         CAST(COUNT(DISTINCT nk) AS BIGINT) AS n_nk_distinct,
         CAST(COUNT(DISTINCT nk)
              + MAX(CASE WHEN nk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_groups_incl_null,
         CAST(SUM(bal_cents) AS BIGINT) AS sum_bal_cents,
         COUNT(CASE WHEN bal_cents IS NULL THEN 1 END) AS n_bal_null
  FROM t),
inner_j AS (
  SELECT COUNT(*) AS inner_join_rows
  FROM t a JOIN t b ON a.nk = b.nk),
nullsafe_j AS (
  SELECT COUNT(*) AS nullsafe_join_rows
  FROM t a JOIN t b ON a.nk IS NOT DISTINCT FROM b.nk)
SELECT * FROM base, inner_j, nullsafe_j
"""


def sequence_packing_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the concat-and-chunk step that turns a document
    stream into fixed-budget training sequences (budget 2048 whitespace
    tokens here): documents are laid out in the deterministic shard/key
    order of [[training_shuffle_shards]] (md5 keys, 32 shards), token
    counts are prefix-summed per shard, and a document's bin is
    ``floor((cumsum - tok) / budget)`` — i.e. bins are cut wherever the
    running concatenation crosses a budget boundary (a document may
    straddle two bins; its bin is where it STARTS, the convention of
    packed-dataset builders that split on the fly).

    Scale shape: one projection (keys + token counts), one per-shard
    cumsum window (shard = the parallelism unit, corpus/32 rows each; use
    thousands of shards at 100 TB), one rollup. The readout is per-shard
    packing efficiency — bins produced, tokens packed, mean fill — the
    number that tells you how much compute a sloppy packer wastes."""
    budget = 2048
    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    key = F.md5(F.concat(F.lit("seed42:"), F.col("doc_id").cast("string")))
    hexdig = "0123456789abcdef"
    t = docs.select(
        "doc_id",
        key.alias("k"),
        whitespace_token_count("text").cast("long").alias("tok"),
    ).withColumn(
        "shard",
        (
            (F.expr(f"instr('{hexdig}', substring(k, 1, 1)) - 1") * 16
             + F.expr(f"instr('{hexdig}', substring(k, 2, 1)) - 1"))
            % 32
        ).cast("long"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("k", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = t.withColumn("cum", F.sum("tok").over(w)).withColumn(
        "bin", F.floor((F.col("cum") - F.col("tok")) / budget)
    )
    return (
        binned.groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            (F.max("bin") + 1).alias("n_bins"),
            F.sum("tok").alias("sum_tokens"),
            F.round(
                F.sum("tok").cast("double") / ((F.max("bin") + 1) * budget), 6
            ).alias("fill_ratio"),
        )
        .orderBy("shard")
    )


SEQUENCE_PACKING_SQL = """
WITH t AS (
  SELECT doc_id,
         md5('seed42:' || CAST(doc_id AS VARCHAR)) AS k,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT)
           AS tok
  FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT doc_id, k, tok,
         CAST(((strpos('0123456789abcdef', substring(k, 1, 1)) - 1) * 16
               + (strpos('0123456789abcdef', substring(k, 2, 1)) - 1)) % 32
              AS BIGINT) AS shard
  FROM t),
c AS (
  SELECT shard, tok,
         SUM(tok) OVER (PARTITION BY shard ORDER BY k, doc_id
                        ROWS UNBOUNDED PRECEDING) AS cum
  FROM s),
b AS (
  SELECT shard, tok, CAST(floor((cum - tok) / 2048.0) AS BIGINT) AS bin
  FROM c)
SELECT shard, COUNT(*) AS n_docs,
       CAST(MAX(bin) + 1 AS BIGINT) AS n_bins,
       CAST(SUM(tok) AS BIGINT) AS sum_tokens,
       round(CAST(SUM(tok) AS DOUBLE) / ((MAX(bin) + 1) * 2048), 6)
         AS fill_ratio
FROM b GROUP BY shard ORDER BY shard
"""


QUERIES = {
    "doc_quality_quartiles": doc_quality_quartiles,
    "training_mix_sample": training_mix_sample,
    "doc_boilerplate_rate": doc_boilerplate_rate,
    "training_shuffle_shards": training_shuffle_shards,
    "udaf_trimmed_mean": udaf_trimmed_mean,
    "null_semantics_parity": null_semantics_parity,
    "sequence_packing_bins": sequence_packing_bins,
}

ORACLES = {
    "doc_quality_quartiles": DOC_QUALITY_QUARTILES_SQL,
    "training_mix_sample": TRAINING_MIX_SQL,
    "doc_boilerplate_rate": DOC_BOILERPLATE_SQL,
    "training_shuffle_shards": TRAINING_SHUFFLE_SQL,
    "udaf_trimmed_mean": UDAF_TRIMMED_MEAN_SQL,
    "null_semantics_parity": NULL_SEMANTICS_SQL,
    "sequence_packing_bins": SEQUENCE_PACKING_SQL,
}
