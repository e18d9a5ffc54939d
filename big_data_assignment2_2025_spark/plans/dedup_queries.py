"""Declared queries for the dedup operator family (operators/dedup.py),
each with a DuckDB oracle that replays the SAME algorithm in SQL — the
hashes are md5-derived specifically so both engines compute identical
signatures (murmur3/xxhash are engine-specific; md5 is not).

The synthetic documents table contains planted near-duplicates (pairs with
3-gram Jaccard up to ~0.99), so thresholded results are non-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    jaccard_pairs_prefix,
    minhash_dedup,
    shingles_df,
    simhash_pairs,
    simhash_signatures,
)
from ..sources.readers import fixture_fingerprint, load_table

#: per-fixture cache of the shingle-fingerprint injectivity probe
#: (see dedup_ngram_threshold)
_INJECTIVE_CACHE: dict[str, bool] = {}

# Shared oracle CTEs: tokens with position, distinct 3-gram shingles.
_SHINGLES_CTE = """
t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_'']+') AS toks
      FROM documents WHERE text IS NOT NULL),
tok AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM t),
sh0 AS (SELECT doc_id,
               term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w AS shingle
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jac AS (SELECT doc1, doc2, inter,
               inter / (s1.n + s2.n - inter) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2)
"""


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs)


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_digest, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


def dedup_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 most similar pairs by exact 3-gram Jaccard."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs, n=3)
    # rank on the ROUNDED jaccard (both engines) so the top-25 cut is stable
    return (
        jaccard_pairs(sh)
        .withColumn("jaccard", F.round("jaccard", 6))
        .orderBy(F.col("jaccard").desc(), F.col("doc1").asc(), F.col("doc2").asc())
        .limit(25)
        .select("doc1", "doc2", "inter", "jaccard")
    )


DEDUP_NGRAM_SQL = f"""
WITH {_SHINGLES_CTE}
SELECT doc1, doc2, inter, round(jaccard, 6) AS jaccard
FROM jac
ORDER BY jaccard DESC, doc1 ASC, doc2 ASC
LIMIT 25
"""


def dedup_ngram_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with 3-gram Jaccard >= 0.5 (the near-dup removal set).

    Since round 9 the plan is the prefix-filtered exact form
    (``jaccard_pairs_prefix``): identical output to the naive inverted-index
    join (the oracle below is unchanged), but candidates come from the
    rarest-first document prefixes only, so hot boilerplate shingles no
    longer drive quadratic pair fan-out (the r8 memprobe measured 2.2 GB
    of spill on the unfiltered plan at the 10x fixture)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs, n=3)
    # the operator's injectivity probe is an eager job; run it once per
    # fixture and reuse (fingerprint-keyed, same discipline as staged
    # derived data) so repeated plan builds stay cheap
    key = fixture_fingerprint(sf_dir)
    if key not in _INJECTIVE_CACHE:
        _INJECTIVE_CACHE[key] = bool(
            sh.agg(
                (
                    F.countDistinct("shingle")
                    == F.countDistinct(F.xxhash64("shingle"))
                ).alias("ok")
            ).collect()[0]["ok"]
        )
    return jaccard_pairs_prefix(
        sh, threshold=0.5, assume_injective=_INJECTIVE_CACHE[key]
    ).select("doc1", "doc2", F.round("jaccard", 6).alias("jaccard"))


DEDUP_NGRAM_THRESHOLD_SQL = f"""
WITH {_SHINGLES_CTE}
SELECT doc1, doc2, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.5
"""


def dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by 3-gram Jaccard over the DF-CAPPED shingle universe:
    shingles appearing in more than 4 documents are dropped BEFORE the
    inverted-index join, and Jaccard (intersection AND sizes) is computed
    on the surviving shingle set.

    This is the standard hot-shingle mitigation at corpus scale: the
    inverted index's pair fan-out is quadratic in per-shingle document
    frequency, so one stopword run shared by 1e6 documents would emit 5e11
    candidate pairs. Capping df bounds fan-out at cap²/2 per shingle while
    leaving discriminative shingles untouched. The cap deliberately BITES
    on the fixture (template shingles exceed df 4), and the oracle mirrors
    the capped universe exactly, so the gate checks the approximation's
    semantics, not just the happy path."""
    docs = load_table(spark, sf_dir, "documents")
    sh = shingles_df(docs, n=3)
    hot = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= 4)
        .select("shingle")
    )
    capped = sh.join(hot, "shingle", "left_semi")
    return (
        jaccard_pairs(capped)
        .where(F.col("jaccard") >= 0.5)
        .select("doc1", "doc2", "inter", F.round("jaccard", 6).alias("jaccard"))
    )


DEDUP_NGRAM_CAPPED_SQL = """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_'']+') AS toks
      FROM documents WHERE text IS NOT NULL),
tok AS (SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS pos FROM t),
sh0 AS (SELECT doc_id,
               term || ' ' || LEAD(term, 1) OVER w || ' ' || LEAD(term, 2) OVER w AS shingle
        FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
sh_all AS (SELECT DISTINCT doc_id, shingle FROM sh0 WHERE shingle IS NOT NULL),
keep AS (SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= 4),
sh AS (SELECT sh_all.* FROM sh_all JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS inter
          FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
jac AS (SELECT doc1, doc2, inter,
               inter / (s1.n + s2.n - inter) AS jaccard
        FROM inter
        JOIN sizes s1 ON s1.doc_id = doc1
        JOIN sizes s2 ON s2.doc_id = doc2)
SELECT doc1, doc2, inter, round(jaccard, 6) AS jaccard
FROM jac WHERE jaccard >= 0.5
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16 hashes)+LSH(4 bands x 4 rows) candidates, exact-Jaccard
    verified at >= 0.5."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(docs, threshold=0.5, n=3, num_hashes=16, bands=4)


DEDUP_MINHASH_SQL = f"""
WITH {_SHINGLES_CTE},
seeds AS (SELECT unnest(range(16)) AS seed),
mh AS (
  SELECT doc_id, seed,
         MIN(CAST('0x' || substring(md5(seed || ':' || shingle), 1, 15) AS BIGINT)) AS mh
  FROM sh CROSS JOIN seeds GROUP BY doc_id, seed
),
sig AS (SELECT doc_id, list(mh ORDER BY seed ASC) AS sig FROM mh GROUP BY doc_id),
bandidx AS (SELECT unnest(range(4)) AS band),
bands AS (
  SELECT doc_id, band,
         md5(array_to_string(sig[CAST(band*4+1 AS INTEGER):CAST(band*4+4 AS INTEGER)], ',')) AS key
  FROM sig CROSS JOIN bandidx
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.doc1, c.doc2, round(j.jaccard, 6) AS jaccard
FROM cand c JOIN jac j ON j.doc1 = c.doc1 AND j.doc2 = c.doc2
WHERE j.jaccard >= 0.5
"""


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash near-dup pairs at Hamming distance <= 3 (found via
    exact 4-chunk blocking, verified by bit_count)."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs)
    return simhash_pairs(sigs, max_hamming=3)


def dedup_simhash_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over an idf-FILTERED vocabulary: terms
    appearing in more than 20% of documents are dropped before signing.

    Why: the 10x scale probe measured chunk-block candidate growth of ~2.3x
    per corpus doubling for plain SimHash on this template-heavy corpus —
    documents sharing a boilerplate skeleton get correlated signatures from
    exactly the terms that carry no identity. Removing corpus-wide hot
    terms (the deterministic equivalent of idf-weighting the signature)
    decorrelates templates while leaving true near-dup pairs intact; the
    probe measures this variant's candidate growth alongside the plain one.
    The 20% threshold is computed from the corpus itself, so the query is
    scale-invariant; the oracle replays the same filter exactly."""
    from ..operators.dedup import simhash_from_tf

    docs = load_table(spark, sf_dir, "documents")
    from ..functions.text import tokenize
    from ..sources.readers import fan_out

    n_docs = docs.where(F.col("text").isNotNull()).count()
    toks = fan_out(docs).select(
        "doc_id", F.explode(tokenize("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("cnt"))
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    keep = df_per_term.where(F.col("df") * 5 <= F.lit(n_docs)).select("term")
    sigs = simhash_from_tf(tf.join(keep, "term", "left_semi"))
    return simhash_pairs(sigs, max_hamming=3)


DEDUP_SIMHASH_IDF_SQL = """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_'']+') AS toks
           FROM documents WHERE text IS NOT NULL),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf0 AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n FROM t),
keep AS (SELECT term FROM tf0 GROUP BY term
         HAVING COUNT(*) * 5 <= (SELECT n FROM nd)),
tf AS (SELECT tf0.* FROM tf0 JOIN keep USING (term)),
th AS (SELECT doc_id, cnt, CAST('0x' || substring(md5(term), 1, 15) AS BIGINT) AS h FROM tf),
bitidx AS (SELECT unnest(range(60)) AS bitpos),
bits AS (
  SELECT doc_id, bitpos,
         SUM(CASE WHEN (h >> CAST(bitpos AS INTEGER)) & 1 = 1 THEN cnt ELSE -cnt END) AS w
  FROM th CROSS JOIN bitidx GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(bitpos AS INTEGER)) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


DEDUP_SIMHASH_SQL = """
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9_'']+') AS toks
           FROM documents WHERE text IS NOT NULL),
tok AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS cnt FROM tok GROUP BY 1, 2),
th AS (SELECT doc_id, cnt, CAST('0x' || substring(md5(term), 1, 15) AS BIGINT) AS h FROM tf),
bitidx AS (SELECT unnest(range(60)) AS bitpos),
bits AS (
  SELECT doc_id, bitpos,
         SUM(CASE WHEN (h >> CAST(bitpos AS INTEGER)) & 1 = 1 THEN cnt ELSE -cnt END) AS w
  FROM th CROSS JOIN bitidx GROUP BY 1, 2
),
sig AS (
  SELECT doc_id,
         SUM(CASE WHEN w > 0 THEN (CAST(1 AS BIGINT) << CAST(bitpos AS INTEGER)) ELSE 0 END) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS doc1, b.doc_id AS doc2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def dedup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: transitive closure of the Jaccard>=0.5 pair graph
    via iterative min-label propagation (operators/graph.py). Output is one
    row per clustered doc: its component id (= min doc_id in the cluster,
    the canonical keeper) and the cluster size."""
    from pyspark.sql import Window

    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(shingles_df(docs, n=3)).where(F.col("jaccard") >= 0.5)
    comp = connected_components(pairs)
    size_w = Window.partitionBy("component")
    return comp.select(
        F.col("node").alias("doc_id"),
        "component",
        F.count("*").over(size_w).alias("cluster_size"),
    )


# The oracle computes the same transitive closure with a recursive CTE:
# reach(node,label) enumerates every (node, reachable id) pair, and
# min(label) per node is exactly the fixpoint min-label propagation reaches.
DEDUP_COMPONENTS_SQL = f"""
WITH RECURSIVE {_SHINGLES_CTE},
e0 AS (SELECT doc1 AS src, doc2 AS dst FROM jac WHERE jaccard >= 0.5),
edges AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
reach(node, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON r.node = e.dst
),
comp AS (SELECT node AS doc_id, MIN(label) AS component FROM reach GROUP BY node)
SELECT doc_id, component,
       count(*) OVER (PARTITION BY component) AS cluster_size
FROM comp
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_cluster_components": dedup_cluster_components,
    "dedup_ngram_topk": dedup_ngram_topk,
    "dedup_ngram_threshold": dedup_ngram_threshold,
    "dedup_ngram_capped": dedup_ngram_capped,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_simhash_idf": dedup_simhash_idf,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_cluster_components": DEDUP_COMPONENTS_SQL,
    "dedup_ngram_topk": DEDUP_NGRAM_SQL,
    "dedup_ngram_threshold": DEDUP_NGRAM_THRESHOLD_SQL,
    "dedup_ngram_capped": DEDUP_NGRAM_CAPPED_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
    "dedup_simhash_idf": DEDUP_SIMHASH_IDF_SQL,
}
