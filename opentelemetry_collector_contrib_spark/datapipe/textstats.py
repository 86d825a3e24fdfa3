"""Text analysis for training-data pipelines: language ID, quality
scoring, token counting, document fingerprinting.

Two implementations with identical results:
- ``text_features``: the HOT PATH — every stat for a document computed
  in ONE Arrow hop (fused pandas UDF).  The Catalyst forms below lean
  on array higher-order functions (filter/aggregate), which are
  interpreted per row (no codegen) — measured 10-50x slower than the
  Arrow batch on this workload.  Only the final round(…, 6) stays in
  Catalyst so the decimal rounding rule matches the DuckDB oracle's.
- the per-feature Catalyst expressions (lang_id, quality_features, …):
  kept as the plan-only/parity reference, pinned equal to the fused
  path by tests/test_textstats parity tests.
"""

from __future__ import annotations

import hashlib
import re as _re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _norm_words_py, norm_words

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


# ---------------------------------------------------------------------------
# fused Arrow path (the hot path)
# ---------------------------------------------------------------------------

_PUNCT_RX = _re.compile(r"[^\w\s]", _re.ASCII)
_BPE_RX = _re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+")
_SW_SETS = {lang: frozenset(ws) for lang, ws in STOPWORDS.items()}

_TEXTSTATS_TYPE = T.StructType([
    T.StructField("pred_lang", T.StringType()),
    T.StructField("n_chars_m", T.IntegerType()),
    T.StructField("n_words", T.IntegerType()),
    T.StructField("n_punct", T.IntegerType()),
    T.StructField("n_bpe", T.IntegerType()),
    T.StructField("mean_wlen_raw", T.DoubleType()),
    T.StructField("punct_r_raw", T.DoubleType()),
    T.StructField("sw_r_raw", T.DoubleType()),
    T.StructField("score_raw", T.DoubleType()),
    T.StructField("fingerprint", T.StringType()),
])


def _textstats_one(t: str | None) -> dict:
    """All stats for one document — the exact arithmetic (operand
    order, int/int double division, left-assoc score sum) of the
    Catalyst expressions above / the DuckDB oracle."""
    t = t or ""
    words = _norm_words_py(t)
    n_chars = len(t)
    n_words = len(words)
    n_punct = len(_PUNCT_RX.findall(t))
    n_bpe = len(_BPE_RX.findall(t))
    hits = {lang: sum(1 for w in words if w in _SW_SETS[lang])
            for lang in LANGS}
    # earliest language in LANGS with the (>=1) max hit count wins —
    # identical to the reversed-iteration argmax in lang_id()
    best, best_hits = "unk", 0
    for lang in reversed(LANGS):
        if hits[lang] >= max(best_hits, 1):
            best = lang
        best_hits = max(best_hits, hits[lang])
    mean_wlen = (sum(len(w) for w in words) / n_words) if n_words else 0.0
    punct_r = (n_punct / n_chars) if n_chars else 0.0
    sw_r = (hits["en"] / n_words) if n_words else 0.0
    score = (min(n_words / 20.0, 1.0) * 0.4
             + (0.3 if 3 <= mean_wlen <= 10 else 0.0)
             + min(sw_r * 5.0, 0.2)
             + (0.1 if punct_r < 0.1 else 0.0))
    return {
        "pred_lang": best, "n_chars_m": n_chars, "n_words": n_words,
        "n_punct": n_punct, "n_bpe": n_bpe, "mean_wlen_raw": mean_wlen,
        "punct_r_raw": punct_r, "sw_r_raw": sw_r, "score_raw": score,
        "fingerprint": hashlib.md5(" ".join(words).encode()).hexdigest(),
    }


@F.pandas_udf(_TEXTSTATS_TYPE)
def _textstats_udf(text: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_textstats_one(t) for t in text])


_REP_TYPE = T.StructType([
    T.StructField("n_2grams", T.IntegerType()),
    T.StructField("top_2gram_count", T.IntegerType()),
    T.StructField("top_2gram_frac", T.DoubleType()),
    T.StructField("dup_word_frac", T.DoubleType()),
])


@F.pandas_udf(_REP_TYPE)
def _repetition_udf(text: pd.Series) -> pd.DataFrame:
    """Repetition features (the Gopher-rules style quality signals):
    coverage of the most frequent word 2-gram and the duplicate-word
    fraction.  One Arrow hop; int/int double divisions match the
    DuckDB oracle's CAST(...)/... arithmetic."""
    from collections import Counter
    rows = []
    for t in text:
        words = _norm_words_py(t)
        n = len(words)
        grams = [f"{words[i]} {words[i + 1]}" for i in range(n - 1)]
        total = len(grams)
        topc = max(Counter(grams).values()) if grams else 0
        rows.append({
            "n_2grams": total,
            "top_2gram_count": topc,
            "top_2gram_frac": (topc / total) if total else 0.0,
            "dup_word_frac": (1.0 - len(set(words)) / n) if n else 0.0,
        })
    return pd.DataFrame(rows)


def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc repetition features; round stays in Catalyst for oracle
    decimal parity (like text_features)."""
    s = _repetition_udf(F.col(text_col))
    return (df.withColumn("_r", s)
            .withColumn("n_2grams", F.col("_r.n_2grams"))
            .withColumn("top_2gram_count", F.col("_r.top_2gram_count"))
            .withColumn("top_2gram_frac", F.round(F.col("_r.top_2gram_frac"), 6))
            .withColumn("dup_word_frac", F.round(F.col("_r.dup_word_frac"), 6))
            .drop("_r"))


# PII scrubbing (training pipelines redact before training).  Patterns
# restricted to syntax with identical semantics in Java regex (Spark)
# and RE2 (DuckDB): no backrefs, no lookaround.
PII_PATTERNS = {
    # order matters: IPs first (an email never matches the IP pattern)
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
}


def scrub_pii(df: DataFrame, text_col: str = "body",
              out_col: str = "scrubbed") -> DataFrame:
    """Redact PII patterns and count redactions per kind — all JVM-side
    (regexp_replace / regexp_extract_all, no Python on the row path).
    Replacement tokens are '[IP]' / '[EMAIL]'."""
    out = df
    scrubbed = F.col(text_col)
    for kind, rx in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(0))))
        scrubbed = F.regexp_replace(scrubbed, rx, f"[{kind.upper()}]")
    return out.withColumn(out_col, scrubbed)


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fused hot path: lang-ID + quality features + BPE-ish count +
    fingerprint in ONE Arrow hop (vs 4x interpreted array HOFs per row
    in the expression forms).  Output columns and values are identical
    to lang_id |> quality_features |> bpe count |> fingerprint; the
    round(…, 6) runs in Catalyst so decimal rounding matches the
    oracle."""
    s = _textstats_udf(F.col(text_col))
    return (df.withColumn("_ts", s)
            .withColumn("pred_lang", F.col("_ts.pred_lang"))
            .withColumn("n_chars_m", F.col("_ts.n_chars_m"))
            .withColumn("n_words", F.col("_ts.n_words"))
            .withColumn("n_punct", F.col("_ts.n_punct"))
            .withColumn("n_bpe", F.col("_ts.n_bpe"))
            .withColumn("mean_word_len", F.round(F.col("_ts.mean_wlen_raw"), 6))
            .withColumn("punct_ratio", F.round(F.col("_ts.punct_r_raw"), 6))
            .withColumn("stopword_ratio", F.round(F.col("_ts.sw_r_raw"), 6))
            .withColumn("quality_score", F.round(F.col("_ts.score_raw"), 6))
            .withColumn("fingerprint", F.col("_ts.fingerprint"))
            .drop("_ts"))
