"""Round-10 queries: scale-hardening gates from the r9 verdict.

- **scale-aware SemDeDup** (``embedding_semdedup_scaled``): the r9 probe
  measured 10.01x (quadratic) within-cell pair growth at a 10x corpus
  with the fixed 8-cell quantizer, and ~10x (linear) with k scaled to the
  corpus — SemDeDup's own regime (Abbas et al. 2023 use k ∝ n, e.g. 50k
  clusters on LAION-440M). ``semantic_dedup`` now derives
  ``k = ceil(n / 50)`` by default; this gate pins that derivation
  cross-engine at every fixture (k=10 at 500 vectors, k=40 at 2000).
  The fixed-k twin ``embedding_semdedup`` stays as the oracle-stable
  baseline-tier query.

No reference counterpart; analytics extensions per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import TARGET_CELL_ROWS, semantic_dedup
from ..sources.readers import load_table

from .similarity_queries import COSINE_SQL_TEMPLATE as _COSINE


def _cos(qv: str, cv: str) -> str:
    return _COSINE.replace("QV", qv).replace("CV", cv)


def embedding_semdedup_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the scale-aware quantizer: n_cells derived from the
    corpus count (k = ceil(n / 50)), within-cell cosine >= 0.4 to a
    lower-id cellmate marks a semantic duplicate. This is the production
    default — fixed k makes within-cell pairs quadratic in the corpus
    (measured in tools/scale_probe.py); scaling k with n keeps them
    linear."""
    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, n_cells=None, threshold=0.4)


SEMDEDUP_SCALED_SQL = f"""
WITH params AS (
  SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {TARGET_CELL_ROWS}.0) AS BIGINT)) AS k
  FROM embeddings),
cents AS (
  SELECT vec_id AS cell, embedding AS cent
  FROM (SELECT vec_id, embedding,
               ROW_NUMBER() OVER (ORDER BY vec_id) AS r
        FROM embeddings), params
  WHERE r <= params.k),
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


QUERIES = {
    "embedding_semdedup_scaled": embedding_semdedup_scaled,
}

ORACLES = {
    "embedding_semdedup_scaled": SEMDEDUP_SCALED_SQL,
}
