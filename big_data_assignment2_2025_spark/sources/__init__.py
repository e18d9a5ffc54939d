from .readers import load_table, load_tables, read_corpus_tsv, read_documents
from .sinks import write_tsv

__all__ = [
    "load_table",
    "load_tables",
    "read_corpus_tsv",
    "read_documents",
    "write_tsv",
]
