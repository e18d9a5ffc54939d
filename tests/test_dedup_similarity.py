"""Unit tests for the LLM-pipeline dedup + similarity operators.

Complements the DuckDB-oracle gate (tools/oracle_check.py) with semantic
invariants on handwritten corpora where the right answer is obvious.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.dedup import (
    exact_dedup_groups,
    hash64,
    jaccard_pairs,
    minhash_dedup,
    shingles_df,
    simhash_pairs,
    simhash_signatures,
)
from big_data_assignment2_2025_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    hyperplane_signature,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat"),  # near dup of 1
        (4, "completely different text about spark engines"),
        (5, "completely different text about spark engines today"),  # near dup of 4
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_groups(docs):
    got = {r.text_digest: (r.keep_id, r.n_copies) for r in exact_dedup_groups(docs).collect()}
    dup_digest = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert got[dup_digest] == (1, 2)
    assert sum(n for _, n in got.values()) == 5


def test_jaccard_identical_docs_is_one(docs):
    sh = shingles_df(docs, n=3)
    pairs = {(r.doc1, r.doc2): r.jaccard for r in jaccard_pairs(sh).collect()}
    assert pairs[(1, 2)] == pytest.approx(1.0)
    # near-dup pair shares most but not all 3-grams
    assert 0.4 < pairs[(1, 3)] < 1.0
    # unrelated docs never materialize (no shared shingle)
    assert (1, 4) not in pairs


def test_minhash_dedup_finds_planted_pairs(docs):
    got = {(r.doc1, r.doc2) for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert (1, 2) in got
    assert (1, 3) in got and (2, 3) in got


def test_simhash_identical_docs_distance_zero(docs):
    sigs = simhash_signatures(docs)
    by_id = {r.doc_id: r.simhash for r in sigs.collect()}
    assert by_id[1] == by_id[2]
    from big_data_assignment2_2025_spark.operators.dedup import SIMHASH_BITS

    assert 0 <= by_id[1] < (1 << SIMHASH_BITS)
    pairs = {(r.doc1, r.doc2): r.hamming for r in simhash_pairs(sigs, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0


def test_hash64_matches_python(spark):
    df = spark.createDataFrame([("0:0",), ("abc",)], ["s"])
    got = {r.s: r.h for r in df.select("s", hash64(F.col("s")).alias("h")).collect()}
    for s, h in got.items():
        assert h == int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_hyperplane_signature_matches_python(spark):
    vec = [0.5, -1.0, 0.25, 2.0]
    df = spark.createDataFrame([(vec,)], ["v"])
    got = df.select(hyperplane_signature(F.col("v"), n_planes=4, dim=4).alias("b")).collect()[0].b

    def sign(p, d):
        return 1.0 if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:15], 16) % 2 == 1 else -1.0

    want = sum(
        (1 << p) for p in range(4) if sum(vec[d] * sign(p, d) for d in range(4)) > 0
    )
    assert got == want


def test_brute_force_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.1]),   # closest to 0
        (2, [0.0, 1.0]),   # orthogonal to 0
        (3, [-1.0, 0.0]),  # opposite of 0
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") == 0)
    got = [
        (r.neighbor_id, r.rank)
        for r in brute_force_topk(emb, q, k=3).orderBy("rank").collect()
    ]
    assert got == [(1, 1), (2, 2), (3, 3)]
    cos = {r.neighbor_id: r.cosine for r in brute_force_topk(emb, q, k=3).collect()}
    assert cos[1] == pytest.approx(1.0 / math.sqrt(1.01), abs=1e-6)
    assert cos[2] == pytest.approx(0.0, abs=1e-9)
    assert cos[3] == pytest.approx(-1.0, abs=1e-9)


def test_cosine_neardup_blocked(spark):
    rows = [
        ("a", 1, [1.0, 0.0]),
        ("a", 2, [0.99, 0.01]),  # same block, near dup
        ("b", 3, [1.0, 0.0]),    # other block: never paired with 1
        ("a", 4, [0.0, 1.0]),    # same block, orthogonal
    ]
    emb = spark.createDataFrame(rows, ["label", "vec_id", "embedding"])
    got = {(r.id1, r.id2) for r in cosine_neardup_pairs(emb, threshold=0.9).collect()}
    assert got == {(1, 2)}


def test_prefix_filtered_jaccard_equals_naive(spark, sf_dir):
    """jaccard_pairs_prefix (AllPairs prefix + PPJoin length/position
    filters + array verification) is EXACT: identical pair set and
    jaccard values to the naive inverted-index form at every threshold
    tried, on both the tiny planted corpus and the fixture corpus."""
    from big_data_assignment2_2025_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )
    from big_data_assignment2_2025_spark.sources.readers import load_table

    corpora = [
        spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "the quick brown fox jumps over the lazy cat"),
                (4, "completely different text about spark engines"),
                (5, "completely different text about spark engines today"),
            ],
            ["doc_id", "text"],
        ),
        load_table(spark, sf_dir, "documents"),
    ]
    for corpus in corpora:
        sh = shingles_df(corpus, n=3)
        for t in (0.3, 0.5, 0.8):
            naive = {
                (r.doc1, r.doc2): round(r.jaccard, 9)
                for r in jaccard_pairs(sh)
                .where(F.col("jaccard") >= t)
                .collect()
            }
            blocked = {
                (r.doc1, r.doc2): round(r.jaccard, 9)
                for r in jaccard_pairs_prefix(sh, threshold=t).collect()
            }
            assert blocked == naive, (t, len(blocked), len(naive))


def test_prefix_jaccard_noninjective_string_path(spark):
    """The non-injective fallback of jaccard_pairs_prefix regenerates
    candidates from raw shingle STRINGS (hash-space prefixes are not
    provably complete under collision) — forcing it with
    assume_injective=False must reproduce the hash path exactly."""
    from big_data_assignment2_2025_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "the quick brown fox jumps over the lazy cat"),
            (4, "completely different text about spark engines"),
        ],
        ["doc_id", "text"],
    )
    sh = shingles_df(corpus, n=3)
    for t in (0.3, 0.8):
        hash_path = {
            (r.doc1, r.doc2): round(r.jaccard, 9)
            for r in jaccard_pairs_prefix(
                sh, threshold=t, assume_injective=True
            ).collect()
        }
        string_path = {
            (r.doc1, r.doc2): round(r.jaccard, 9)
            for r in jaccard_pairs_prefix(
                sh, threshold=t, assume_injective=False
            ).collect()
        }
        assert string_path == hash_path, (t, string_path, hash_path)
