"""Text column expressions — all native (JVM-side, whole-stage codegen).

Tokenizer parity is the one genuinely fiddly reference semantic
(SURVEY.md hard part #1): the reference tokenizes with
``re.findall(r"[\\w\\']+", text.lower())`` (``app/mapreduce/mapper1.py:18``,
``mapper2.py:19``, same lowercasing for query terms at ``app/query.py:21``).
Python ``\\w`` is *Unicode* (letters, digits, marks, underscore); Java's
default ``\\w`` is ASCII. We therefore split on the complement character
class built from Unicode properties so `café`, `中文`, `don't`
and `snake_case` tokenize identically to CPython.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Unicode equivalent of Python's ``[\w']`` — letters, marks (combining
#: accents count as word chars in CPython), digits, underscore, apostrophe.
TOKEN_PATTERN = r"[\p{L}\p{M}\p{N}_']+"
_TOKEN_SPLIT = r"[^\p{L}\p{M}\p{N}_']+"


def tokenize(text: Column | str) -> Column:
    """``array<string>`` of lowercased tokens; parity with
    ``re.findall(r"[\\w']+", text.lower())``."""
    col = F.col(text) if isinstance(text, str) else text
    parts = F.split(F.lower(col), _TOKEN_SPLIT)
    return F.filter(parts, lambda t: t != F.lit(""))


def tokens_of(df, text_col: str = "text", out: str = "term"):
    """Explode a corpus into one row per token occurrence.

    This is the Spark-native form of the mapper flatMap (reference
    ``mapper2.py:22-23``): never materialized, feeds straight into the
    aggregations of the index builder.
    """
    keep = [c for c in df.columns if c != text_col]
    return df.select(*keep, F.explode(tokenize(text_col)).alias(out))


# ---------------------------------------------------------------------------
# Text-analysis operators (LLM-data-pipeline extensions; no reference
# counterpart — designed for 100 TB corpora: pure column expressions,
# no UDFs, one pass over the text column).
# ---------------------------------------------------------------------------

#: tiny per-language stopword marker lists for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}


def language_id(text: Column | str) -> Column:
    """Heuristic language ID: count stopword hits per language over the
    token array, pick the argmax, 'und' (undetermined) when nothing hits.

    Scale note: evaluated as a single projection, no shuffle, no UDF.
    """
    toks = tokenize(text)

    # NB: the filter lambda must take exactly ONE parameter — F.filter treats
    # a two-parameter lambda as (element, index), so capturing the word list
    # via a default arg (lambda t, ws=words: ...) binds ws to the index.
    def _hits(words: list) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = [(lang, _hits(words)) for lang, words in _LANG_MARKERS.items()]
    best = F.lit("und")
    best_score = F.lit(0)
    for lang, score in scores:
        better = score > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, score).otherwise(best_score)
    return best


def whitespace_token_count(text: Column | str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column | str) -> Column:
    """BPE-flavored token estimate: count runs of letters, runs of digits,
    and individual punctuation marks (what a byte-pair vocab roughly yields).
    """
    col = F.col(text) if isinstance(text, str) else text
    pieces = F.regexp_extract_all(
        F.lower(col), F.lit(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]"), 0
    )
    return F.size(pieces)


def quality_score(text: Column | str) -> Column:
    """Composite document-quality score in [0, 1]:
    0.4 * length band + 0.3 * alpha ratio + 0.3 * stopword presence.

    All arithmetic stays in doubles with a fixed operation order so the
    DuckDB oracle reproduces it bit-for-bit.
    """
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col).cast("double")
    toks = tokenize(col)
    n_tok = F.size(toks).cast("double")
    alpha = F.length(F.regexp_replace(col, r"[^\p{L}]", "")).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "and", "of", "to", "is", "a", "in"))
    ).cast("double")
    len_band = F.when((n >= 100) & (n <= 20000), F.lit(1.0)).otherwise(
        F.when(n > 0, F.lit(0.5)).otherwise(F.lit(0.0))
    )
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, F.least(F.lit(1.0), stop_hits * 10.0 / n_tok)).otherwise(
        F.lit(0.0)
    )
    return len_band * 0.4 + alpha_ratio * 0.3 + stop_ratio * 0.3


def doc_fingerprint(text: Column | str, mod: int = 2**31 - 1) -> Column:
    """Deterministic rolling-hash fingerprint of the token stream:
    ``h = (h * 31 + len(token) * 131 + first_char_code) % mod`` folded over
    tokens. Pure ``F.aggregate`` over the token array — portable to the
    DuckDB oracle (``list_reduce``), no UDF, no shuffle. ``mod`` kept below
    2**31 so ``acc * 31`` cannot overflow a 64-bit long.
    """
    toks = tokenize(text)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(31)
            + F.length(t).cast("long") * F.lit(131)
            + F.ascii(t).cast("long")
        )
        % F.lit(mod),
    )
