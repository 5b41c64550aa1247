"""Text-analysis operators for the web-page payload (training-data pipeline).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs.  Each operator keeps the `text`
column untouched (byte-identity invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword markers for the n-gram/stopword heuristic.
LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "es": ["el", "y", "de"],
}


def with_token_count(df: DataFrame, text: str = "text",
                     out: str = "n_tokens") -> DataFrame:
    """Whitespace token count (single-space-separated corpus)."""
    t = F.col(text)
    n = F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.length(t) - F.length(F.replace(t, F.lit(" "), F.lit(""))) + 1)
    return df.withColumn(out, n.cast("long"))


# GPT-2-style pretokenizer WITHOUT lookahead (RE2-compatible, so the
# DuckDB oracle evaluates the identical pattern): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
BPE_TOKEN_PATTERN = (
    "'(?:[sdmt]|ll|ve|re)"
    "| ?[A-Za-z]+| ?[0-9]+| ?[^\\sA-Za-z0-9']+|\\s+")


def with_bpe_token_count(df: DataFrame, text: str = "text",
                         out: str = "n_bpe_tokens") -> DataFrame:
    """BPE-ish subword-boundary token count: the number of pretokenizer
    matches (the unit BPE merges start from).  Pure JVM regex — one
    regexp_extract_all + size per row."""
    return df.withColumn(out, F.size(F.regexp_extract_all(
        F.col(text), F.lit(BPE_TOKEN_PATTERN), F.lit(0))).cast("long"))


def with_quality_score(df: DataFrame, text: str = "text") -> DataFrame:
    """Length/word-length quality heuristics; columns n_chars_q, n_tokens,
    avg_token_len, quality."""
    df = with_token_count(df, text)
    t = F.col(text)
    df = df.withColumn("n_chars_q", F.length(t).cast("long"))
    df = df.withColumn(
        "avg_token_len",
        F.when(F.col("n_tokens") > 0,
               (F.col("n_chars_q") - (F.col("n_tokens") - 1)) / F.col("n_tokens"))
        .otherwise(F.lit(0.0)))
    df = df.withColumn(
        "quality",
        F.when((F.col("n_tokens") >= 5) & (F.col("avg_token_len") >= 2.0) &
               (F.col("avg_token_len") <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0)))
    return df


def with_lang_guess(df: DataFrame, text: str = "text",
                    out: str = "lang_guess") -> DataFrame:
    """Stopword-marker language ID (n-gram heuristic, first match wins)."""
    t = F.concat(F.lit(" "), F.col(text), F.lit(" "))
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        hits = sum((F.when(t.contains(f" {m} "), 1).otherwise(0)
                    for m in LANG_MARKERS[lang]), F.lit(0))
        expr = F.when(hits >= 1, F.lit(lang)).otherwise(expr)
    return df.withColumn(out, expr)


def with_fingerprint(df: DataFrame, text: str = "text",
                     out: str = "fingerprint") -> DataFrame:
    """Document fingerprint: 64-bit hash of the normalised text."""
    norm = F.lower(F.regexp_replace(F.col(text), r"\s+", " "))
    return df.withColumn(out, F.xxhash64(norm))


# Winnowing constants: polynomial rolling hash base/modulus.  M = 2^31-1
# keeps every intermediate (< 2^62) exact in uint64 vector arithmetic.
_WIN_B = 257
_WIN_M = 2147483647


def winnow_text(s: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowing fingerprints of one string (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): k-gram ROLLING polynomial hash over characters, then the
    minimum of each sliding window of `window` consecutive k-gram hashes
    (rightmost-minimum tie rule), recorded once per selected position.
    Guarantee: two documents sharing a substring of length >= window+k-1
    share at least one fingerprint.  Returns sorted distinct hashes."""
    import numpy as np
    c = np.frombuffer(s.lower().encode("utf-8", "ignore"),
                      dtype=np.uint8).astype(np.uint64)
    n = len(c)
    if n < k:
        return [int(c.sum() % _WIN_M)] if n else []
    # prefix hashes P[i] = (P[i-1]*B + c[i]) mod M; h_j over [j, j+k)
    p = np.empty(n + 1, dtype=np.uint64)
    p[0] = 0
    for i in range(n):                     # scalar loop is fine: C-speed ints
        p[i + 1] = (p[i] * _WIN_B + c[i]) % _WIN_M
    bk = pow(_WIN_B, k, _WIN_M)
    h = (p[k:] + _WIN_M * _WIN_M - p[:-k] * np.uint64(bk)) % _WIN_M
    if len(h) <= window:
        return sorted({int(h.min())})
    from numpy.lib.stride_tricks import sliding_window_view
    wins = sliding_window_view(h, window)
    # rightmost minimum: argmin over the reversed window
    rev_arg = wins[:, ::-1].argmin(axis=1)
    pos = np.arange(len(wins)) + (window - 1 - rev_arg)
    sel = np.unique(pos)                   # record once per selected k-gram
    return sorted({int(v) for v in h[sel]})


def with_winnowing(df: DataFrame, text: str = "text", k: int = 5,
                   window: int = 4, out: str = "fingerprints") -> DataFrame:
    """Winnowing fingerprint set per document as array<long> — the
    rolling-hash document fingerprinting of the training-data brief; pair
    with explode + groupBy(fingerprint) for containment-style near-dup
    candidate generation at corpus scale (one shuffle on the hash)."""
    @F.pandas_udf("array<long>")
    def fp(texts: pd.Series) -> pd.Series:
        return pd.Series([winnow_text(t or "", k, window) for t in texts])

    return df.withColumn(out, fp(F.col(text)))
