"""Document chunking for LLM training-data preparation.

Splits each document into fixed-size token windows with configurable
overlap — the standard pre-tokenization step before packing sequences into
training batches. Pure column expressions (split → sequence → explode →
slice), so the whole operator stays inside whole-stage codegen with zero
Python UDFs; the explode fans out rows partition-locally, so no shuffle is
introduced beyond whatever the consumer adds.

Scale notes (100 TB): chunk fan-out multiplies row count by ~n_tokens/stride
but each output row carries only the chunk (not the full document), so the
byte volume grows by ~window/stride (1.33x at 32/24). The operator preserves
the input partitioning — downstream dedup-by-chunk-hash shuffles on
chunk_hash, which is uniformly distributed (md5), i.e. skew-free.

Reference parity: the reference tokenizes whole documents for its inverted
index (app/mapreduce/mapper1.py:18) and has no chunking; this operator is a
driver-mandated training-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    window: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """Chunk ``text_col`` into ``window``-token pieces every ``stride``
    tokens (overlap = window - stride). Returns one row per chunk:
    (id_col, chunk_id, chunk_len, chunk_hash [, chunk_text]).

    Token boundaries are single spaces (matching the corpus format); the
    final chunk may be shorter than ``window``. chunk_hash is the md5 of the
    space-joined chunk — a portable fingerprint both Spark and DuckDB
    compute identically, used for chunk-level dedup downstream.
    """
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    chunked = (
        docs.select(id_col, toks.alias("_toks"))
        .withColumn("_n", F.size("_toks"))
        .select(
            id_col,
            "_toks",
            "_n",
            F.explode(
                F.sequence(F.lit(1), F.col("_n"), F.lit(stride))
            ).alias("_start"),
        )
    )
    chunk_text: Column = F.concat_ws(
        " ", F.slice(F.col("_toks"), F.col("_start"), window)
    )
    out = chunked.select(
        id_col,
        ((F.col("_start") - 1) / stride).cast("long").alias("chunk_id"),
        F.least(F.lit(window), F.col("_n") - F.col("_start") + 1)
        .cast("long")
        .alias("chunk_len"),
        F.md5(chunk_text).alias("chunk_hash"),
        *([chunk_text.alias("chunk_text")] if keep_text else []),
    )
    return out
