"""BM25 ranked retrieval — the reference query path as ONE lazy Spark plan.

Semantics replicated exactly from reference ``app/query.py``:
- query parsing: whitespace split, lowercase, dedup (``query.py:12,21``)
- BM25 with k1=1, b=0.75 and the *simplified* IDF ``ln(N/df)`` — NOT
  Robertson's ``ln((N-df+0.5)/(df+0.5)+1)`` (``query.py:131-135``)
- per-document score = sum of per-term BM25 (``query.py:139-140``)
- top-10 by score descending (``query.py:143``)
- empty vocabulary -> empty result with schema
  (doc_id int, doc_title string, doc_rank double) (``query.py:38-54``)

What is deliberately NOT replicated (performance anti-patterns, SURVEY.md §4):
the reference's 4 eager driver round-trips (``query.py:38,58,76,123``) and the
N+1 per-term/per-doc Cassandra scans (``query.py:64-73,90-97``). Here the
whole query is one declarative plan -> one action:

  term_freq.where(term isin q)            -- parquet-pushed filter
    JOIN broadcast(term_doc_freq filtered) -- tiny: <= #query terms rows
    JOIN doc_info                          -- inner join doubles as the
                                              manual semi-join at query.py:61-97
    CROSS JOIN broadcast(corpus_info)      -- the lit(N)/lit(avgdl) scalars
    -> bm25 column expr -> groupBy(doc) sum -> TakeOrderedAndProject(10)

Scale notes: the only shuffle is the final groupBy on (doc_id, doc_title),
over rows already restricted to query terms; both dimension joins broadcast.
Catalyst plans the top-10 as TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .index import WHOLE_CORPUS, InvertedIndex

K1 = 1.0   # reference app/query.py:131
B = 0.75   # reference app/query.py:132


def parse_query(query: str) -> list[str]:
    """Whitespace split, lowercase, dedup (reference ``app/query.py:12,21``).
    Sorted for deterministic plans (set order is arbitrary in CPython)."""
    return sorted({w.lower() for w in query.split()})


def bm25_expr(tf: Column, df: Column, dl: Column, doc_n: Column, total_len: Column) -> Column:
    """The exact score expression of reference ``app/query.py:135``."""
    avgdl = total_len.cast("double") / doc_n.cast("double")
    idf = F.log(doc_n.cast("double") / df.cast("double"))
    tf_d = tf.cast("double")
    return idf * ((K1 + 1.0) * tf_d) / (K1 * (1.0 - B + B * dl.cast("double") / avgdl) + tf_d)


def bm25_scores(index: InvertedIndex, terms: list[str], corpus_name: str = WHOLE_CORPUS) -> DataFrame:
    """Per-(term, doc) BM25 rows for the given pre-parsed terms."""
    tf = index.term_freq.where(
        (F.col("corpus_name") == corpus_name) & F.col("term").isin(terms)
    )
    vocab = index.term_doc_freq.where(
        (F.col("corpus_name") == corpus_name) & F.col("term").isin(terms)
    )
    stats = index.corpus_info.where(F.col("corpus_name") == corpus_name).select(
        "doc_n", "total_doc_length"
    )
    return (
        tf.join(F.broadcast(vocab), ["term", "corpus_name"], "inner")
        .join(index.doc_info, ["doc_id", "doc_title"], "inner")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "bm25",
            bm25_expr(
                F.col("term_frequency"),
                F.col("doc_frequency"),
                F.col("doc_length"),
                F.col("doc_n"),
                F.col("total_doc_length"),
            ),
        )
    )


def bm25_search(
    index: InvertedIndex,
    query: str,
    k: int = 10,
    corpus_name: str = WHOLE_CORPUS,
    deterministic_ties: bool = False,
) -> DataFrame:
    """Top-k documents for a free-text query.

    Returns ``(doc_id int, doc_title string, doc_rank double)`` — the
    reference result schema (``app/query.py:40-44``). An empty vocabulary
    yields an empty frame with this schema with no driver-side probe needed
    (vs the eager ``head(1)`` at ``query.py:38``).

    ``deterministic_ties`` adds (doc_id) as a tie-break sort key — used by
    differential tests; the public default keeps reference ordering.
    """
    scored = bm25_scores(index, parse_query(query), corpus_name)
    ranked = scored.groupBy("doc_id", "doc_title").agg(
        F.sum("bm25").alias("doc_rank")
    )
    order = [F.col("doc_rank").desc()]
    if deterministic_ties:
        order.append(F.col("doc_id").asc())
    return ranked.select(
        F.col("doc_id").cast("int").alias("doc_id"),
        "doc_title",
        F.col("doc_rank").cast("double").alias("doc_rank"),
    ).orderBy(*order).limit(k)
