"""Cross-validate our hand-rolled MinHash-LSH dedup (operators/dedup.py)
against Spark MLlib's ``MinHashLSH`` on the same corpus.

Both pipelines do candidate-generation-then-exact-verification (MLlib's
``approxSimilarityJoin`` reports the *exact* Jaccard distance for every
candidate pair), so after thresholding both should land on the ground-truth
pair set computed by the all-pairs exact ``jaccard_pairs``. This pins our
operator's semantics to an independent, widely-deployed implementation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.dedup import (
    jaccard_pairs,
    minhash_dedup,
    shingles_df,
)

THRESHOLD = 0.5


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "the quick brown fox jumps over the lazy cat"),
        (4, "completely different text about spark engines"),
        (5, "completely different text about spark engines today"),
        (6, "unrelated filler sentence mentioning databases and storage"),
        (7, "the fast brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _truth_pairs(corpus):
    sh = shingles_df(corpus)
    return {
        (r.doc1, r.doc2)
        for r in jaccard_pairs(sh).where(F.col("jaccard") >= THRESHOLD).collect()
    }


def _mllib_pairs(spark, corpus):
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    sh = (
        shingles_df(corpus)
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("shingles"))
    )
    cv = CountVectorizer(
        inputCol="shingles", outputCol="features", binary=True
    ).fit(sh)
    feats = cv.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=16, seed=42
    ).fit(feats)
    joined = lsh.approxSimilarityJoin(
        feats, feats, threshold=1.0 - THRESHOLD, distCol="dist"
    )
    return {
        (r.a, r.b)
        for r in joined.select(
            F.col("datasetA.doc_id").alias("a"), F.col("datasetB.doc_id").alias("b")
        )
        .where(F.col("a") < F.col("b"))
        .collect()
    }


def test_ours_matches_mllib_and_truth(spark, corpus):
    truth = _truth_pairs(corpus)
    assert truth, "fixture must contain near-duplicate pairs"

    # MLlib's numHashTables=16 is 16 bands of 1 row; run ours at the same
    # operating point so the S-curves match (at the default 4 bands x 4 rows
    # a J~=0.55 pair is only caught ~30% of the time — correct LSH behavior,
    # but not comparable to MLlib's config).
    ours = {
        (r.doc1, r.doc2)
        for r in minhash_dedup(corpus, threshold=THRESHOLD, bands=16).collect()
    }
    # exact verification step => no false positives on either side
    assert ours <= truth
    mllib = _mllib_pairs(spark, corpus)
    assert mllib <= truth

    # at 16 bands x 1 row both catch every planted pair
    assert ours == truth
    assert mllib == truth
