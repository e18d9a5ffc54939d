"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference repo ``Rufina2323/big-data-assignment2-2025``.

The reference is a distributed BM25 full-text search engine (Hadoop-Streaming
MapReduce indexing into Cassandra + a PySpark query pipeline). This package
re-expresses the same semantics Spark-first:

- ``functions.text``   tokenizer & text-analysis column expressions
- ``operators.index``  inverted-index builder (one Spark job, one shuffle)
- ``operators.search`` BM25 ranked retrieval (single-action plan)
- ``operators.dedup``  exact / MinHash-LSH / SimHash / n-gram / embedding dedup
- ``operators.similarity`` brute-force + LSH-bucketed cosine ANN
- ``operators.multimodal`` binary-column decode/feature plumbing (stubbed codecs)
- ``plans``            the declared query registry (queries + DuckDB oracles)
- ``streaming``        Structured Streaming over the events table
- ``sources``          readers/sinks (parquet, TSV corpus, per-doc dump)

Everything on the hot path is native Column expressions (whole-stage
codegen); Python appears only in Arrow-batched pandas UDFs where built-ins
genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
