"""Tokenization + token-array transforms (reference parity: ml.feature
Tokenizer/RegexTokenizer/StopWordsRemover/NGram — mllib/src/main/scala/org/
apache/spark/ml/feature/Tokenizer.scala:32/66, StopWordsRemover.scala:35,
NGram.scala:37 — and the `sentences` SQL expression,
stringExpressions.scala:1393).

Every function returns a Column built purely from `pyspark.sql.functions`
(codegen'd, no Python), and has a DuckDB SQL twin used by the oracle
queries. The tokenizer is deliberately simple and *identically specified* in
both engines: lowercase, split on runs of non-alphanumerics, drop empties.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"

# Minimal English stopword list (subset of the reference's bundled
# StopWordsRemover english list) — kept tiny and fixed so oracle SQL can
# inline it.
STOPWORDS = ("a", "an", "and", "are", "as", "at", "be", "by", "for", "from",
             "in", "is", "it", "of", "on", "or", "that", "the", "to", "with")


def tokenize(col: Column | str) -> Column:
    """lower → split on non-alphanumeric runs → drop empty strings.

    Semantics = reference RegexTokenizer(pattern="\\W+", toLowercase=true)
    (Tokenizer.scala:66) restricted to ASCII alnum for cross-engine parity.
    """
    return F.filter(F.split(F.lower(col), TOKEN_SPLIT_RE), lambda t: t != "")


def tokenize_duck(expr: str) -> str:
    return (
        f"list_filter(regexp_split_to_array(lower({expr}), '{TOKEN_SPLIT_RE}'),"
        " t -> t <> '')"
    )


def remove_stopwords(tokens: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Drop stopwords, preserving duplicates and order (array_except would
    dedup — reference StopWordsRemover keeps duplicates, so filter).

    Membership is ``isin`` (r9): past spark.sql.optimizer
    .inSetConversionThreshold entries it plans as InSet — an O(1) hash
    probe per token instead of array_contains' O(|stopwords|) literal
    array scan (A/B at sf0.1: ~1.5x on the membership sub-expression,
    identical results)."""
    return F.filter(tokens, lambda t: ~t.isin(*stopwords))


def remove_stopwords_duck(expr: str, stopwords: tuple[str, ...] = STOPWORDS) -> str:
    lst = ", ".join(f"'{s}'" for s in stopwords)
    return f"list_filter({expr}, t -> NOT list_contains([{lst}], t))"


def ngrams(tokens: Column, n: int = 2, sep: str = " ") -> Column:
    """Sliding n-grams joined by ``sep`` (reference NGram.scala:37).
    Empty result if fewer than n tokens.

    Shape matters (r7, the Catalyst lambda-recompute pitfall): the
    earlier `transform(sequence(...), i -> concat_ws(sep, slice(tokens,
    i, n)))` form referenced ``tokens`` INSIDE the lambda, so a non-
    trivial input expression (e.g. tokenize's regex split) re-evaluated
    once per n-gram — measured 6x on bigrams over raw text. This form
    zips n shifted slices instead: the slice arguments evaluate the
    input exactly n times per ROW, and the lambda touches only its
    element arguments."""
    size = F.size(tokens)
    m = F.greatest(size - (n - 1), F.lit(0))  # n-gram count (>=0 for slice)
    out = F.slice(tokens, 1, m)
    for i in range(1, n):
        out = F.zip_with(
            out,
            F.slice(tokens, 1 + i, m),
            lambda a, b: F.concat(a, F.lit(sep), b),
        )
    return F.when(size < n, F.array().cast("array<string>")).otherwise(out)


def ngrams_duck(expr: str, n: int = 2, sep: str = " ") -> str:
    # DuckDB list slicing arr[i:j] is inclusive on both ends, 1-based.
    return (
        f"CASE WHEN len({expr}) < {n} THEN [] "
        f"ELSE list_transform(range(1, len({expr}) - {n} + 2), "
        f"i -> array_to_string(({expr})[i:i+{n - 1}], '{sep}')) END"
    )


def shingles(col: Column | str, k: int = 3) -> Column:
    """Token k-shingles of a raw text column — MinHash input."""
    return ngrams(tokenize(col), n=k)


def shingles_duck(expr: str, k: int = 3) -> str:
    return ngrams_duck(tokenize_duck(expr), n=k)


def normalize_text(col: Column | str) -> Column:
    """Canonical form for exact-dup detection: lowercase, strip
    non-alphanumerics to single spaces, trim."""
    return F.trim(F.regexp_replace(F.lower(col), TOKEN_SPLIT_RE, " "))


def normalize_text_duck(expr: str) -> str:
    return f"trim(regexp_replace(lower({expr}), '{TOKEN_SPLIT_RE}', ' ', 'g'))"
