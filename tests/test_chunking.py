"""Invariant tests for operators/chunking.chunk_documents.

Golden model: a pure-Python chunker over the same window/stride semantics.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from big_data_assignment2_2025_spark.operators.chunking import chunk_documents


def _py_chunks(text, window, stride):
    toks = text.split(" ")
    out = []
    for cid, start in enumerate(range(0, len(toks), stride)):
        piece = toks[start : start + window]
        out.append(
            (
                cid,
                len(piece),
                hashlib.md5(" ".join(piece).encode()).hexdigest(),
            )
        )
    return out


def test_chunking_matches_python_model(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "one"),
        (3, " ".join(f"t{i}" for i in range(100))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r.doc_id, r.chunk_id): (r.chunk_len, r.chunk_hash)
        for r in chunk_documents(df, window=4, stride=3).collect()
    }
    for doc_id, text in rows:
        expected = _py_chunks(text, 4, 3)
        for cid, clen, chash in expected:
            assert got[(doc_id, cid)] == (clen, chash), (doc_id, cid)
        # no extra chunks beyond the model's
        assert len([k for k in got if k[0] == doc_id]) == len(expected)


def test_chunking_overlap_and_coverage(spark, sf_dir):
    """Every token position is covered; consecutive chunks overlap by
    window - stride tokens (except the final short chunk)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    window, stride = 32, 24
    chunks = chunk_documents(
        docs, window=window, stride=stride, keep_text=True
    ).collect()
    n_toks = {
        r.doc_id: len(r.text.split(" ")) for r in docs.collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_id)
        # coverage: last chunk reaches the final token
        last = rs[-1]
        assert last.chunk_id * stride + last.chunk_len == n_toks[doc_id]
        # stride spacing: chunk i starts at i*stride
        for i, r in enumerate(rs):
            assert r.chunk_id == i
            assert r.chunk_len <= window
            if i < len(rs) - 1:
                nxt = rs[i + 1]
                a, b = r.chunk_text.split(" "), nxt.chunk_text.split(" ")
                assert a[stride:] == b[: len(a) - stride]
