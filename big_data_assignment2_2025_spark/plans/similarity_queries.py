"""Declared queries for similarity search (operators/similarity.py) with
DuckDB oracles computing the same cosine/LSH math in SQL.

Cosines are rounded to 6 decimals BEFORE ranking on both sides: double
accumulation order differs between engines, and ranking on the rounded
value keeps the top-k cut deterministic (ties broken by neighbor id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    ivf_topk,
    lsh_bucketed_topk,
)
from ..sources.readers import load_table

# dot/norm on doubles; embeddings are FLOAT[] so cast element-wise (exact).
#: engine-parity-critical rounded-cosine SQL with QV/CV operand
#: placeholders — the ONE copy every oracle derives from
COSINE_SQL_TEMPLATE = """
round(
  list_sum(list_transform(range(1, len(QV) + 1), i -> CAST(QV[CAST(i AS INTEGER)] AS DOUBLE) * CAST(CV[CAST(i AS INTEGER)] AS DOUBLE)))
  / (sqrt(list_sum(list_transform(range(1, len(QV) + 1), i -> CAST(QV[CAST(i AS INTEGER)] AS DOUBLE) * CAST(QV[CAST(i AS INTEGER)] AS DOUBLE))))
     * sqrt(list_sum(list_transform(range(1, len(CV) + 1), i -> CAST(CV[CAST(i AS INTEGER)] AS DOUBLE) * CAST(CV[CAST(i AS INTEGER)] AS DOUBLE))))),
  6)
"""

_COSINE_EXPR = COSINE_SQL_TEMPLATE.replace("QV", "qv").replace("CV", "cv")


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for query vectors vec_id < 5."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=5)


ANN_BRUTEFORCE_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_COSINE_EXPR} AS cosine
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via 8-plane random-hyperplane LSH buckets (md5-
    derived hyperplanes, reproducible in any engine), exact re-rank inside
    the bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    # dim=None: the signature derives each vector's width at runtime, so a
    # regenerated fixture with a different embedding dim stays correct (the
    # oracle reads len(embedding) the same way)
    return lsh_bucketed_topk(emb, queries, k=5, n_planes=8, dim=None)


ANN_LSH_SQL = f"""
WITH planes AS (
  SELECT p, d,
         CASE WHEN CAST('0x' || substring(md5(p || ':' || d), 1, 15) AS BIGINT) % 2 = 1
              THEN 1.0 ELSE -1.0 END AS s
  FROM (SELECT unnest(range(8)) AS p), (SELECT unnest(range(CAST((SELECT len(embedding) FROM embeddings LIMIT 1) AS BIGINT))) AS d)
),
sigs AS (
  SELECT e.vec_id,
         SUM(CASE WHEN pd.dot > 0 THEN (1 << CAST(pd.p AS INTEGER)) ELSE 0 END) AS bucket
  FROM (SELECT vec_id FROM embeddings) e
  JOIN (
    SELECT vec_id, p,
           SUM(CAST(embedding[CAST(d + 1 AS INTEGER)] AS DOUBLE) * s) AS dot
    FROM embeddings CROSS JOIN planes
    GROUP BY vec_id, p
  ) pd USING (vec_id)
  GROUP BY e.vec_id
),
q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, s.bucket
      FROM embeddings e JOIN sigs s USING (vec_id) WHERE e.vec_id < 5),
c AS (SELECT e.vec_id AS neighbor_id, e.embedding AS cv, s.bucket
      FROM embeddings e JOIN sigs s USING (vec_id)),
scored AS (
  SELECT query_id, neighbor_id, {_COSINE_EXPR} AS cosine
  FROM c JOIN q USING (bucket) WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: 8 deterministic centroid cells (lowest-id vectors),
    2-probe search, exact cosine re-rank within probed cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=5, n_cells=8, n_probe=2)


ANN_IVF_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cell, embedding AS cent FROM embeddings ORDER BY vec_id LIMIT 8),
c_assign AS (
  SELECT neighbor_id, cv, cell FROM (
    SELECT e.vec_id AS neighbor_id, e.embedding AS cv, ct.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(ct.cent[CAST(i AS INTEGER)] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                         * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(ct.cent[CAST(i AS INTEGER)] AS DOUBLE)
                         * CAST(ct.cent[CAST(i AS INTEGER)] AS DOUBLE))))), 6) DESC,
               ct.cell ASC) AS r
    FROM embeddings e CROSS JOIN cents ct) WHERE r <= 1),
q_assign AS (
  SELECT query_id, qv, cell FROM (
    SELECT e.vec_id AS query_id, e.embedding AS qv, ct.cell,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY round(
               list_sum(list_transform(range(1, len(e.embedding) + 1),
                 i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                      * CAST(ct.cent[CAST(i AS INTEGER)] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)
                         * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE))))
                  * sqrt(list_sum(list_transform(range(1, len(e.embedding) + 1),
                    i -> CAST(ct.cent[CAST(i AS INTEGER)] AS DOUBLE)
                         * CAST(ct.cent[CAST(i AS INTEGER)] AS DOUBLE))))), 6) DESC,
               ct.cell ASC) AS r
    FROM embeddings e CROSS JOIN cents ct WHERE e.vec_id < 5) WHERE r <= 2),
scored AS (
  SELECT DISTINCT query_id, neighbor_id, {_COSINE_EXPR} AS cosine
  FROM c_assign JOIN q_assign USING (cell)
  WHERE query_id <> neighbor_id),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine >= 0.4 pairs within label blocks (blocking bounds the pair
    space; embeddings are near-orthogonal so 0.4 is the near-dup tail)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_neardup_pairs(emb, threshold=0.4, block_col="label")


EMBEDDING_NEARDUP_SQL = f"""
WITH p AS (
  SELECT a.label AS blk, a.vec_id AS id1, b.vec_id AS id2,
         a.embedding AS qv, b.embedding AS cv
  FROM embeddings a
  JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
)
SELECT blk, id1, id2, {_COSINE_EXPR} AS cosine
FROM p
WHERE {_COSINE_EXPR} >= 0.4
"""


def knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification over the embedding space: each query vector takes
    the majority label of its 5 nearest (exact cosine) labeled neighbors;
    vote ties break to the smallest label. The expensive part IS the ANN
    top-k (reused unchanged); classification adds a broadcast label join
    plus a per-query vote — negligible against the similarity scan, which
    is how k-NN inference composes at scale (swap brute force for the IVF
    path when the corpus outgrows a cross join)."""
    from pyspark.sql import Window as W

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    topk = brute_force_topk(emb, queries, k=5)
    labeled = topk.join(
        F.broadcast(
            emb.select(F.col("vec_id").alias("neighbor_id"), "label")
        ),
        "neighbor_id",
    )
    votes = labeled.groupBy("query_id", "label").agg(
        F.count("*").alias("n_votes")
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("n_votes").desc(), F.col("label").asc()
    )
    return (
        votes.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select(
            "query_id",
            F.col("label").alias("predicted_label"),
            "n_votes",
        )
        .orderBy("query_id")
    )


KNN_CLASSIFY_SQL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, label, {_COSINE_EXPR} AS cosine
  FROM c CROSS JOIN q WHERE query_id <> neighbor_id
),
ranked AS (
  SELECT query_id, label,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
),
votes AS (
  SELECT query_id, label, COUNT(*) AS n_votes
  FROM ranked WHERE rank <= 5
  GROUP BY query_id, label
),
best AS (
  SELECT query_id, label, n_votes,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY n_votes DESC, label ASC) AS r
  FROM votes)
SELECT query_id, label AS predicted_label, n_votes
FROM best WHERE r = 1
ORDER BY query_id
"""


def _sign_signatures(emb: DataFrame) -> DataFrame:
    """(vec_id, sig_lo, sig_hi): 64-bit sign-bit signature as two positive
    32-bit halves (see embedding_binary_hamming_topk)."""
    sig_lo = F.expr(
        "aggregate(sequence(0, least(size(embedding), 32) - 1), 0L,"
        " (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > 0"
        " THEN shiftleft(1L, i) ELSE 0L END)"
    )
    sig_hi = F.expr(
        "CASE WHEN size(embedding) > 32 THEN"
        " aggregate(sequence(32, size(embedding) - 1), 0L,"
        " (acc, i) -> acc + CASE WHEN element_at(embedding, i + 1) > 0"
        " THEN shiftleft(1L, i - 32) ELSE 0L END) ELSE 0L END"
    )
    return emb.select("vec_id", sig_lo.alias("sig_lo"), sig_hi.alias("sig_hi"))


def embedding_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming top-5 neighbors over SIGN-BIT binarized embeddings for query
    vectors vec_id < 5 — the 32x-compression scan path of a vector store.

    Each d<=64-dim float vector collapses to a 64-bit sign signature (bit i
    set iff x_i > 0), carried as two 32-bit halves in BIGINTs so every value
    stays positive (identical xor/bit_count semantics cross-engine, no
    sign-bit or ANSI-overflow corner). Distance = popcount(xor) — integer
    codegen over 8 bytes/vector, which is why binary signatures are THE
    memory-bandwidth-bound brute-force at corpus scale: a 100 TB fp32
    embedding table becomes ~3 TB of signatures that scan at memory speed,
    and a production pipeline reranks the Hamming shortlist with exact
    cosine (compose with ``brute_force_topk`` on the shortlist).

    Everything is integers from frozen expressions, so the result
    hash-gates exactly; ranking ties break by neighbor_id."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    sigs = _sign_signatures(emb)
    q = sigs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("sig_lo").alias("q_lo"),
        F.col("sig_hi").alias("q_hi"),
    )
    c = sigs.select(
        F.col("vec_id").alias("neighbor_id"), "sig_lo", "sig_hi"
    )
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "hamming",
            (
                F.bit_count(F.expr("sig_lo ^ q_lo"))
                + F.bit_count(F.expr("sig_hi ^ q_hi"))
            ).cast("long"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "hamming", F.col("rank").cast("int").alias("rank"))
    )


EMBEDDING_BINARY_HAMMING_SQL = """
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) > 0
),
sig AS (
  SELECT vec_id,
    COALESCE(list_sum(list_transform(range(0, least(len(embedding), 32)),
      i -> CASE WHEN embedding[CAST(i + 1 AS INTEGER)] > 0
                THEN 1::BIGINT << i ELSE 0::BIGINT END)), 0) AS sig_lo,
    COALESCE(list_sum(list_transform(range(32, greatest(len(embedding), 32)),
      i -> CASE WHEN embedding[CAST(i + 1 AS INTEGER)] > 0
                THEN 1::BIGINT << (i - 32) ELSE 0::BIGINT END)), 0) AS sig_hi
  FROM e
),
q AS (SELECT vec_id AS query_id, sig_lo AS q_lo, sig_hi AS q_hi FROM sig WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         CAST(bit_count(xor(c.sig_lo, q.q_lo))
              + bit_count(xor(c.sig_hi, q.q_hi)) AS BIGINT) AS hamming
  FROM sig c CROSS JOIN q
  WHERE q.query_id <> c.vec_id
),
ranked AS (
  SELECT query_id, neighbor_id, hamming,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY hamming ASC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, hamming, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


#: Hamming shortlist size per query before the exact rerank
_RERANK_SHORTLIST = 32


def ann_hamming_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: 32-candidate Hamming shortlist over the binary
    signatures, exact-cosine rerank to top-5 — the production vector-store
    read path.

    Stage 1 scans ONLY the 8-byte signatures (memory-bandwidth-bound; the
    fp32 vectors are never touched); stage 2 probes the full-precision
    table by equi-join for just shortlist_size x n_queries rows. At 100 TB
    the expensive float table is read for a few hundred rows per query
    instead of scanned — the same shortlist-then-verify discipline as the
    LSH/IVF families, but with a deterministic integer stage 1 that
    hash-gates exactly. Both stages' cuts are totally ordered
    ((hamming, id), then (rounded cosine desc, id)), so the composed result
    is engine-reproducible."""
    from pyspark.sql import Window

    from ..functions.vectors import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull() & (F.size("embedding") > 0)
    )
    sigs = _sign_signatures(emb)
    q = sigs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("sig_lo").alias("q_lo"),
        F.col("sig_hi").alias("q_hi"),
    )
    c = sigs.select(F.col("vec_id").alias("neighbor_id"), "sig_lo", "sig_hi")
    hamming = (
        F.bit_count(F.expr("sig_lo ^ q_lo"))
        + F.bit_count(F.expr("sig_hi ^ q_hi"))
    ).cast("long")
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("hamming").asc(), F.col("neighbor_id").asc()
    )
    shortlist = (
        c.join(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("hamming", hamming)
        .withColumn("hrank", F.row_number().over(w1))
        .where(F.col("hrank") <= _RERANK_SHORTLIST)
        .select("query_id", "neighbor_id")
    )
    qv = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    cv = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec")
    )
    rer = (
        shortlist.join(cv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                cosine_similarity(F.col("q_vec"), F.col("c_vec")), 6
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        rer.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


ANN_HAMMING_RERANK_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) > 0
),
sig AS (
  SELECT vec_id,
    COALESCE(list_sum(list_transform(range(0, least(len(embedding), 32)),
      i -> CASE WHEN embedding[CAST(i + 1 AS INTEGER)] > 0
                THEN 1::BIGINT << i ELSE 0::BIGINT END)), 0) AS sig_lo,
    COALESCE(list_sum(list_transform(range(32, greatest(len(embedding), 32)),
      i -> CASE WHEN embedding[CAST(i + 1 AS INTEGER)] > 0
                THEN 1::BIGINT << (i - 32) ELSE 0::BIGINT END)), 0) AS sig_hi
  FROM e
),
q AS (SELECT vec_id AS query_id, sig_lo AS q_lo, sig_hi AS q_hi FROM sig WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         bit_count(xor(c.sig_lo, q.q_lo)) + bit_count(xor(c.sig_hi, q.q_hi)) AS hamming
  FROM sig c CROSS JOIN q
  WHERE q.query_id <> c.vec_id
),
shortlist AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY hamming ASC, neighbor_id ASC) AS hrank
    FROM scored) s
  WHERE hrank <= {_RERANK_SHORTLIST}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
         (SELECT {_COSINE_EXPR.strip()}
          FROM (SELECT eq.embedding AS qv, ec.embedding AS cv) t) AS cosine
  FROM shortlist s
  JOIN e ec ON ec.vec_id = s.neighbor_id
  JOIN e eq ON eq.vec_id = s.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM rer
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 5
"""


QUERIES = {
    "knn_classify": knn_classify,
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_lsh_bucketed": ann_lsh_bucketed,
    "ann_ivf_topk": ann_ivf_topk,
    "embedding_neardup": embedding_neardup,
    "embedding_binary_hamming_topk": embedding_binary_hamming_topk,
    "ann_hamming_rerank": ann_hamming_rerank,
}

ORACLES = {
    "knn_classify": KNN_CLASSIFY_SQL,
    "ann_bruteforce_topk": ANN_BRUTEFORCE_SQL,
    "ann_lsh_bucketed": ANN_LSH_SQL,
    "ann_ivf_topk": ANN_IVF_SQL,
    "embedding_neardup": EMBEDDING_NEARDUP_SQL,
    "embedding_binary_hamming_topk": EMBEDDING_BINARY_HAMMING_SQL,
    "ann_hamming_rerank": ANN_HAMMING_RERANK_SQL,
}
