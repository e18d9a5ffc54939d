from .index import InvertedIndex, build_index, incremental_reindex
from .search import bm25_search, bm25_scores

__all__ = [
    "InvertedIndex",
    "build_index",
    "incremental_reindex",
    "bm25_search",
    "bm25_scores",
]
