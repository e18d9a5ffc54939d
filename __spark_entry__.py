"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual engine lives in ``big_data_assignment2_2025_spark/``; this file
just re-exports its declared query registry (``plans/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: build the inverted index
    from the documents corpus and run a BM25 top-10 search (the reference's
    ``search.sh`` path, reference app/query.py)."""
    from big_data_assignment2_2025_spark.operators.index import build_index
    from big_data_assignment2_2025_spark.operators.search import bm25_search
    from big_data_assignment2_2025_spark.plans.search_queries import FLAGSHIP_QUERY
    from big_data_assignment2_2025_spark.sources.readers import read_documents

    index = build_index(read_documents(spark, "/root/testdata/sf0.001"))
    return bm25_search(index, FLAGSHIP_QUERY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from big_data_assignment2_2025_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each query (omitted for the few
    non-SQL-expressible ops -> driver records a rows-only check)."""
    from big_data_assignment2_2025_spark.plans import ORACLES

    return dict(ORACLES)
