"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate) — zero Python in
the row loop; each has an exact ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import norm_words

# tiny committed stopword inventories (top function words per language)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "que", "de", "por"],
}
LANGS = list(STOPWORDS)


def token_count(text_col) -> Column:
    """Whitespace token count."""
    return F.size(norm_words(text_col))


def bpe_ish_token_count(text_col) -> Column:
    """BPE-ish sub-token count via the classic GPT-2 pre-tokenizer-style
    regex: contractions, letter runs, digit runs, punctuation runs."""
    rx = r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+"
    return F.size(F.regexp_extract_all(text_col, F.lit(rx), F.lit(0)))


def stopword_hits(words: Column, lang: str) -> Column:
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(words, lambda w: F.array_contains(sw, w)))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Argmax stopword-hit language; 'unk' when no stopwords hit.
    Deterministic tie-break: language order in LANGS."""
    df = df.withColumn("_w", norm_words(F.col(text_col)))
    for lang in LANGS:
        df = df.withColumn(f"_hits_{lang}", stopword_hits(F.col("_w"), lang))
    best = F.lit("unk")
    best_hits = F.lit(0)
    for lang in reversed(LANGS):       # earlier langs win ties
        h = F.col(f"_hits_{lang}")
        best = F.when(h >= F.greatest(best_hits, F.lit(1)), F.lit(lang)).otherwise(best)
        best_hits = F.greatest(best_hits, h)
    df = df.withColumn("pred_lang", best)
    return df.drop("_w", *[f"_hits_{lang}" for lang in LANGS])


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio / word-length features and
    a simple deterministic quality score in [0,1]."""
    words = norm_words(F.col(text_col))
    n_chars = F.length(F.col(text_col))
    n_words = F.size(words)
    n_punct = F.size(F.regexp_extract_all(F.col(text_col),
                                          F.lit(r"[^\w\s]"), F.lit(0)))
    en_sw = stopword_hits(words, "en")
    mean_wlen = F.when(n_words > 0,
                       F.aggregate(words, F.lit(0),
                                   lambda acc, w: acc + F.length(w))
                       .cast("double") / n_words).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(0.0)
    sw_ratio = F.when(n_words > 0, en_sw.cast("double") / n_words).otherwise(0.0)
    # monotone heuristic: enough words, sane word length, some function
    # words, not punctuation soup
    score = (F.least(n_words.cast("double") / 20.0, F.lit(1.0)) * 0.4
             + F.when((mean_wlen >= 3) & (mean_wlen <= 10), 0.3).otherwise(0.0)
             + F.least(sw_ratio * 5.0, F.lit(0.2))
             + F.when(punct_ratio < 0.1, 0.1).otherwise(0.0))
    return (df.withColumn("n_chars_m", n_chars)
            .withColumn("n_words", n_words)
            .withColumn("n_punct", n_punct)
            .withColumn("mean_word_len", F.round(mean_wlen, 6))
            .withColumn("punct_ratio", F.round(punct_ratio, 6))
            .withColumn("stopword_ratio", F.round(sw_ratio, 6))
            .withColumn("quality_score", F.round(score, 6)))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-invariant document fingerprint: md5 of the
    normalized word sequence (whitespace/punct/case-insensitive)."""
    normed = F.array_join(norm_words(F.col(text_col)), " ")
    return df.withColumn("fingerprint", F.md5(normed))
