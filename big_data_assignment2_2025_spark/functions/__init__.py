from .text import (
    TOKEN_PATTERN,
    bpe_ish_token_count,
    doc_fingerprint,
    language_id,
    quality_score,
    tokenize,
    tokens_of,
    whitespace_token_count,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "TOKEN_PATTERN",
    "tokenize",
    "tokens_of",
    "language_id",
    "quality_score",
    "whitespace_token_count",
    "bpe_ish_token_count",
    "doc_fingerprint",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
