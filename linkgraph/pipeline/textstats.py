"""Text analysis operators: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

All JVM-side column expressions (split / regexp_extract_all / md5) so
they run inside whole-stage codegen over the scan — a 10^12-row
documents table never crosses the Python boundary for these.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny, deliberately language-distinctive stopword sets
STOPWORDS = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
}


def token_count_col(text_col: str = "text"):
    """Whitespace token count as a column expression."""
    return F.size(F.split(F.trim(F.col(text_col)), r"\s+"))


def _stop_hits(text_col: str, words: list[str]):
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(pat), F.lit(0)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc structural stats: tokens, chars, punctuation count,
    mean token length."""
    return df.withColumns(
        {
            "n_tokens": token_count_col(text_col).cast("long"),
            "n_chars_m": F.length(F.col(text_col)).cast("long"),
            "n_punct": F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(r"([.,;:!?])"), F.lit(0))
            ).cast("long"),
        }
    ).withColumn(
        "mean_token_len",
        (F.col("n_chars_m") - F.col("n_tokens") + 1) / F.col("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic [0,1] quality: length in range, low punctuation
    density, sane mean token length. Mirrors the structure of
    production quality filters; the exact weights are pinned for
    test determinism."""
    s = text_stats(df, text_col)
    return s.withColumn(
        "quality",
        (
            F.when((F.col("n_tokens") >= 10) & (F.col("n_tokens") <= 100000), 0.4).otherwise(0.0)
            + F.when((F.col("n_punct") / F.greatest(F.col("n_chars_m"), F.lit(1))) < 0.1, 0.3).otherwise(0.0)
            + F.when((F.col("mean_token_len") >= 2.0) & (F.col("mean_token_len") <= 12.0), 0.3).otherwise(0.0)
        ).cast("double"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n-gram/stopword-ratio language ID: argmax over per-language
    stopword hit counts; 'und' (undetermined) when no stopwords hit.

    The argmax is the same pure (count, label) tie-break pattern as
    LPA — greatest-struct, no window, partition-invariant.
    """
    hits = [
        F.struct(
            _stop_hits(text_col, words).alias("hits"),
            F.lit(lang).alias("lang"),  # tie → lexicographically largest lang
        )
        for lang, words in sorted(STOPWORDS.items())
    ]
    best = F.greatest(*hits)
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint_col(text_col: str = "text", prefix_len: int = 64):
    """Deterministic document fingerprint: md5 of the lowercased,
    whitespace-collapsed prefix — robust to trailing noise, cheap, and
    reproducible in any engine (the DuckDB oracle computes the same)."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    return F.md5(F.substring(norm, 1, prefix_len))
