"""Round-8 queries: the two published-method dedup gaps left in the
LLM-pipeline surface.

- **semantic dedup** (``embedding_semdedup``): SemDeDup (Abbas et al.
  2023) re-expressed on the deterministic IVF quantizer — cluster the
  embedding space into cells, drop within-cell vectors whose cosine to a
  lower-id cellmate clears the threshold. Complements
  ``embedding_neardup`` (label-blocked pairs) by *discovering* the
  blocking from geometry, which is the production shape when no cheap
  block key exists: the cluster step is what bounds the pair space at
  100 TB.
- **exact-substring dedup** (``docs_exact_substring_dedup``): the
  ExactSubstr signal of Lee et al. 2022 via content-defined anchor
  sampling — hash every 40-char window, keep windows whose hash is
  0 mod 20 (selection depends only on bytes, so shared substrings pick
  identical anchors at any offset), join on anchor equality.
  Complements the token-Jaccard family: a licence block shared by two
  long, otherwise-distinct documents is invisible to a 0.5-Jaccard
  gate but lights up here.

Both hash-gated: cosine rounded to 6 decimals pre-threshold (the
similarity-family discipline), anchors are md5-derived integers both
engines compute bit-for-bit.

No reference counterpart; analytics extensions per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import char_anchor_pairs, winnowing_pairs
from ..operators.similarity import semantic_dedup
from ..sources.readers import load_table

from .similarity_queries import COSINE_SQL_TEMPLATE as _COSINE


def _cos(qv: str, cv: str) -> str:
    return _COSINE.replace("QV", qv).replace("CV", cv)


def embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding corpus: 8 deterministic centroid
    cells, within-cell cosine >= 0.4 to a lower-id cellmate marks a
    semantic duplicate. Full-corpus verdict row per vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_cells=8, threshold=0.4)


SEMDEDUP_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cell, embedding AS cent FROM embeddings ORDER BY vec_id LIMIT 8),
assign AS (
  SELECT vec_id, cv, cell FROM (
    SELECT e.vec_id, e.embedding AS cv, ct.cell,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             {_cos('ct.cent', 'e.embedding')} DESC, ct.cell ASC) AS r
    FROM embeddings e CROSS JOIN cents ct) WHERE r <= 1),
dup_counts AS (
  SELECT a.cell, b.vec_id, COUNT(*) AS n_dup_lower
  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE {_cos('a.cv', 'b.cv')} >= 0.4
  GROUP BY a.cell, b.vec_id)
SELECT s.cell, s.vec_id,
       CAST(COALESCE(d.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
       CAST(CASE WHEN d.n_dup_lower IS NULL THEN 1 ELSE 0 END AS INTEGER) AS kept
FROM assign s LEFT JOIN dup_counts d ON s.cell = d.cell AND s.vec_id = d.vec_id
"""


def docs_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document pairs sharing verbatim >=40-char runs, detected through
    content-defined anchor windows (width 40, content gate 1/20)."""
    docs = load_table(spark, sf_dir, "documents")
    return char_anchor_pairs(docs, width=40, stride=20)


EXACT_SUBSTRING_SQL = """
WITH grams AS (
  SELECT DISTINCT doc_id,
         CAST('0x' || substring(md5(substring(text, CAST(p AS INTEGER), 40)), 1, 15) AS BIGINT) AS gh
  FROM documents, unnest(range(1, length(text) - 38)) AS t(p)
  WHERE length(text) >= 40
),
anchors AS (SELECT doc_id, gh FROM grams WHERE gh % 20 = 0)
SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared_anchors
FROM anchors a JOIN anchors b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


def docs_winnowing_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) fingerprint pairs: min-hash of every 20 consecutive
    40-char window hashes — GUARANTEED detection of shared runs >= 59
    chars, the certainty counterpart of the 1/20 content gate."""
    docs = load_table(spark, sf_dir, "documents")
    return winnowing_pairs(docs, width=40, window=20)


WINNOWING_SQL = """
WITH gh AS (
  SELECT doc_id,
         list_transform(range(1, length(text) - 38),
           p -> CAST('0x' || substring(md5(substring(text, CAST(p AS INTEGER), 40)), 1, 15) AS BIGINT)) AS hs
  FROM documents WHERE length(text) >= 40
),
fps AS (
  SELECT DISTINCT doc_id, fp
  FROM gh, unnest(list_distinct(list_transform(
         range(1, GREATEST(len(hs) - 19, 1) + 1),
         j -> list_min(hs[CAST(j AS INTEGER):CAST(j + 19 AS INTEGER)])))) AS t(fp)
)
SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS n_shared_fingerprints
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


QUERIES = {
    "embedding_semdedup": embedding_semdedup,
    "docs_exact_substring_dedup": docs_exact_substring_dedup,
    "docs_winnowing_dedup": docs_winnowing_dedup,
}

ORACLES = {
    "embedding_semdedup": SEMDEDUP_SQL,
    "docs_exact_substring_dedup": EXACT_SUBSTRING_SQL,
    "docs_winnowing_dedup": WINNOWING_SQL,
}
