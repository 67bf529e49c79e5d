"""Tokenization + text statistics as Column expressions.

Reference behavior: BM25 tokenizer lowercases, extracts ``\\b\\w+\\b``
words, drops stopwords and tokens of length ≤ 2
(app/services/search_service.py:281-285, two_tier_chunker.py:69-76).

The regex used here is ``[a-z0-9]+`` over the lowercased text: on
lowercased input it yields the same maximal word runs as ``\\w+`` while
behaving identically in Spark's (Java) and DuckDB's (RE2) regex
engines — that equivalence is what makes the oracle comparison exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

# Stopword list from the reference's BM25 search tokenizer
# (app/services/search_service.py:283 uses a small english stoplist;
# two_tier_chunker.py:69-76 the same shape). Kept deliberately small
# and explicit so the SQL oracle can inline it.
STOPWORDS = (
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to", "for",
    "of", "with", "by", "from", "as", "is", "are", "was", "were", "be",
    "been", "being", "have", "has", "had", "do", "does", "did", "will",
    "would", "could", "should", "may", "might", "can", "this", "that",
    "these", "those", "it", "its", "not", "no", "yes", "all", "any",
)

MIN_TOKEN_LEN = 3


def tokenize(col: Column | str) -> Column:
    """All word tokens (lowercased), no filtering."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN_RE), 0)


def bm25_tokens(col: Column | str) -> Column:
    """Reference BM25 tokens: lowercase words, len>=3, stopword-filtered.

    NOTE: array-returning form. In exploded pipelines prefer
    ``explode(tokenize(x)).filter(is_content_token(token))`` — the
    lambda here runs in Spark's *interpreted* higher-order-function
    evaluator (no codegen), which costs ~100× at corpus scale; the
    post-explode filter compiles to a codegen'd IN-list."""
    toks = tokenize(col)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    return F.filter(
        toks, lambda t: (F.length(t) >= MIN_TOKEN_LEN) & ~F.array_contains(stop, t)
    )


def is_content_token(col: Column | str) -> Column:
    """Row-level predicate equivalent of the bm25_tokens filter —
    apply AFTER explode so it stays in whole-stage codegen."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(c) >= MIN_TOKEN_LEN) & ~c.isin(*STOPWORDS)


def _sql_stoplist() -> str:
    return "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"


def tokenize_sql(col: str) -> str:
    """DuckDB twin of :func:`tokenize`."""
    return f"regexp_extract_all(lower({col}), '{TOKEN_RE}')"


def bm25_tokens_sql(col: str) -> str:
    """DuckDB twin of :func:`bm25_tokens`."""
    return (
        f"list_filter({tokenize_sql(col)}, "
        f"t -> length(t) >= {MIN_TOKEN_LEN} AND NOT list_contains({_sql_stoplist()}, t))"
    )
