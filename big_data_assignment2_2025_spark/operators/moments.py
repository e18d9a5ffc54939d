"""Distributed exact moment (Gram) matrix over an embedding column — the
core primitive behind linear models, PCA, ridge regression and whitening
at corpus scale: G = X^T X plus per-dimension sums, computed in one pass.

No reference counterpart. The scale shape matters more than the math:
a naive explode spells d^2 rows PER VECTOR (x64 dims = 2,080 upper-
triangle pairs -> a 2,080x row fan-out before the shuffle). Here each
Arrow batch folds into ONE d x d int64 partial (numpy ``M.T @ M`` — BLAS
on a few thousand rows), and only the d(d+1)/2 partial entries per batch
cross the wire. Shuffle volume is O(batches x d^2), independent of row
count — the same partial-aggregation argument as SCALING.md §11, applied
to a matrix-valued aggregate.

Exactness: values are scaled to integer micros with sign-aware
half-away-from-zero rounding (numpy's ``round`` is banker's — WRONG here;
DuckDB/Spark ``round`` are half-away-from-zero), so partials are exact
int64 (|micros| <= 1e6 -> per-row products <= 1e12; a 1e6-row batch sums
to <= 1e18 < 2^63). That bound is ENFORCED, not assumed: ``partials``
raises if ``max|micros| * max|micros| * batch_rows`` could exceed int64
(numpy would wrap silently) — callers with larger magnitudes (e.g. an
unbounded label column through ``ridge_fit_predict``) fail loudly
instead of corrupting the fit. Cross-batch merge sums as decimal(38,0), exact to 1e38 — at a
1e9-row, 1000-executor scale int64 merge WOULD overflow; decimal is the
documented merge type. Output is cast to BIGINT for the oracle (fixture
magnitudes fit comfortably).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _round_half_away(a):
    import numpy as np

    return np.sign(a) * np.floor(np.abs(a) + 0.5)


def gram_matrix(
    df: DataFrame, vec_col: str = "embedding", scale: float = 1e6
) -> DataFrame:
    """Upper-triangle exact integer Gram matrix of ``vec_col``:
    rows (i, j, s) with 1-based indices, i <= j, and
    s = sum over rows of micros_i * micros_j (micros = round(x*scale))."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            vecs = pdf[vec_col].to_numpy()
            if len(vecs) == 0:
                continue
            m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            micros = _round_half_away(m * scale).astype(np.int64)
            # int64 overflow guard: the in-batch product accumulates as
            # int64, and numpy WRAPS silently on overflow. Bound the batch
            # contribution by max|micros|^2 * rows and refuse to proceed if
            # it could exceed 2^63-1 (the decimal(38,0) merge only protects
            # the cross-batch sum, not this product).
            peak = float(np.max(np.abs(micros))) if micros.size else 0.0
            if peak * peak * len(micros) > float(2**63 - 1):
                raise OverflowError(
                    f"gram_matrix batch would overflow int64: "
                    f"max|micros|={peak:.3g}, rows={len(micros)} -> bound "
                    f"{peak * peak * len(micros):.3g} > 2^63-1. Reduce "
                    f"`scale`, normalize the input column (ridge labels "
                    f"must be bounded), or shrink Arrow batches via "
                    f"spark.sql.execution.arrow.maxRecordsPerBatch."
                )
            g = micros.T @ micros  # d x d int64, exact (guard above)
            d = g.shape[0]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame(
                {
                    "i": (iu + 1).astype("int32"),
                    "j": (ju + 1).astype("int32"),
                    "partial": g[iu, ju],
                }
            )

    parts = df.select(vec_col).mapInPandas(
        partials, schema="i int, j int, partial long"
    )
    return (
        parts.groupBy("i", "j")
        .agg(
            F.sum(F.col("partial").cast("decimal(38,0)"))
            .cast("long")
            .alias("s")
        )
    )


def pca_project(
    df: DataFrame, vec_col: str = "embedding", k: int = 2, scale: float = 1e6
) -> DataFrame:
    """Project each vector onto the top-``k`` principal axes of the
    (uncentered) second-moment matrix — the standard embedding-PCA shape.

    Scale anatomy: the only driver-side object is the d x d Gram matrix
    (``gram_matrix`` collect — d^2 longs, bounded by dimension, never by
    rows; same bounded-collect discipline as ``operators/ranking.py``).
    The eigendecomposition is numpy on that d x d matrix (microseconds),
    and the projection is a broadcast-free literal expression: each
    component is one ``aggregate(zip_with(...))`` dot product against the
    eigenvector embedded as an array literal, fully inside codegen.
    Deterministic given the data (exact integer Gram -> LAPACK eigh on
    identical input), but NOT SQL-expressible — registry-gated rows-only,
    invariants pinned in tests."""
    import numpy as np

    rows = gram_matrix(df, vec_col, scale).collect()
    d = max(r["j"] for r in rows)
    g = np.zeros((d, d), dtype=np.float64)
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["s"]
        g[r["j"] - 1, r["i"] - 1] = r["s"]
    g /= scale * scale  # back to original units
    vals, vecs = np.linalg.eigh(g)  # ascending
    order = np.argsort(vals)[::-1][:k]
    out = df
    for c, idx in enumerate(order, start=1):
        v = vecs[:, idx]
        # eigh's sign is arbitrary; fix it so results are reproducible
        if v[int(np.argmax(np.abs(v)))] < 0:
            v = -v
        lit = F.array(*[F.lit(float(x)) for x in v])
        out = out.withColumn(
            f"pc{c}",
            F.aggregate(
                F.zip_with(
                    F.col(vec_col).cast("array<double>"),
                    lit,
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    return out.drop(vec_col)


def ridge_fit_predict(
    df: DataFrame,
    vec_col: str = "embedding",
    target_col: str = "label",
    reg: float = 1e-3,
    scale: float = 1e6,
) -> DataFrame:
    """Closed-form ridge regression of ``target_col`` on ``vec_col`` with
    an intercept, scored back over the corpus.

    One-pass sufficient statistics via the AUGMENTED Gram trick: append
    [1.0, y] to each vector and reuse ``gram_matrix`` — the (d+2)x(d+2)
    matrix then contains X'ᵀX' (features+intercept), X'ᵀy and yᵀy in one
    exact integer aggregate; no second scan, no float-order dependence.
    The driver solves a (d+1) system (numpy, microseconds) and the scoring
    pass is a literal-embedded dot product inside codegen — the same
    bounded-driver/broadcast-free anatomy as ``pca_project``."""
    import numpy as np

    aug = df.withColumn(
        "__aug",
        F.concat(
            F.col(vec_col).cast("array<double>"),
            F.array(F.lit(1.0), F.col(target_col).cast("double")),
        ),
    )
    rows = gram_matrix(aug, "__aug", scale).collect()
    m = max(r["j"] for r in rows)  # d + 2
    g = np.zeros((m, m), dtype=np.float64)
    for r in rows:
        g[r["i"] - 1, r["j"] - 1] = r["s"]
        g[r["j"] - 1, r["i"] - 1] = r["s"]
    g /= scale * scale
    d = m - 2  # feature dims (last two = intercept, target)
    xtx = g[: d + 1, : d + 1]  # features + intercept block
    xty = g[: d + 1, d + 1]
    # no penalty on the intercept term
    pen = np.eye(d + 1) * reg
    pen[d, d] = 0.0
    w = np.linalg.solve(xtx + pen, xty)
    coef, intercept = w[:d], float(w[d])
    lit = F.array(*[F.lit(float(c)) for c in coef])
    pred = (
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"), lit, lambda a, b: a * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        + F.lit(intercept)
    )
    return df.withColumn("pred", pred).drop(vec_col)
