"""Text-analysis operators for the web-page payload (training-data pipeline).

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs.  Each operator keeps the `text`
column untouched (byte-identity invariant, BASELINE.json input_hint).
"""

from __future__ import annotations

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
