"""Trained-centroid IVF (MLlib KMeans): recall bound vs brute force — the
verification pattern for operators whose trained state can't be replayed in
SQL (cf. tests/test_mllib_minhash.py)."""

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.similarity import (
    brute_force_topk,
    ivf_kmeans_topk,
)


def test_ivf_kmeans_recall(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_kmeans_topk(emb, queries, k=5, n_cells=8, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"recall {recall}: {sorted(exact - approx)}"


def test_ivf_kmeans_output_shape(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ivf_kmeans_topk(emb, emb.where(F.col("vec_id") < 3), k=4)
    rows = out.collect()
    assert {r["query_id"] for r in rows} <= {0, 1, 2}
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
