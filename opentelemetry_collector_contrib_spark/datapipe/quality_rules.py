"""Gopher quality-rule battery — the classic doc-level heuristic filter
for LLM training corpora (Rae et al. 2021, arXiv:2112.11446, table A1;
the same battery later reused by MassiveText descendants).

Rules (exact public thresholds), each emitted as a value + a boolean so
downstream can re-threshold without recomputation:

1. ``n_words``       in [50, 100_000]
2. ``mean_wlen``     in [3, 10]
3. ``symbol_ratio``  (('#' + '...') occurrences / words)  <= 0.1
4. ``bullet_frac``   (lines starting with a bullet)       <= 0.90
5. ``ellipsis_frac`` (lines ending with an ellipsis)      <= 0.30
6. ``alpha_frac``    (words containing [A-Za-z])          >= 0.80
7. ``stop_hits``     (distinct hits among the 8 canonical English
   stop words: the/be/to/of/and/that/have/with)           >= 2

``gopher_pass`` is the AND of all seven.

Scale design: ONE fused Arrow hop per document (the textstats.py
discipline — array higher-order functions are interpreted per row, so
a 7-rule battery as Catalyst HOFs would be 7+ interpreted passes), then
pure-codegen thresholding.  Shuffles: none — the op is a projection.

Tokenization conventions are pinned so the DuckDB oracle twin
(queries_ext.py) is expressible verbatim: words split on ASCII
whitespace ``[ \\t\\n\\r\\f\\v]+``; lines split on ``\\n``; bullet test
after stripping leading spaces/tabs; ellipsis test after stripping
trailing spaces/tabs; '...' counted non-overlapping left-to-right
(the string-replace counting rule, identical in Java/Python/DuckDB).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
BULLETS = ("- ", "* ", "•")          # dash / star / •
_WS = re.compile(r"[ \t\n\r\f\v]+")
_ALPHA = re.compile(r"[A-Za-z]")

_SCHEMA = T.StructType([
    T.StructField("n_words", T.LongType()),
    T.StructField("word_chars", T.LongType()),
    T.StructField("n_symbols", T.LongType()),
    T.StructField("n_lines", T.LongType()),
    T.StructField("n_bullet", T.LongType()),
    T.StructField("n_ellipsis", T.LongType()),
    T.StructField("n_alpha_words", T.LongType()),
    T.StructField("stop_hits", T.LongType()),
])


def _features_py(text: str) -> tuple:
    words = [w for w in _WS.split(text) if w]
    lines = text.split("\n")
    lower = text.lower()
    lwords = set(_WS.split(lower))
    return (
        len(words),
        sum(len(w) for w in words),
        text.count("#") + text.count("..."),
        len(lines),
        sum(1 for ln in lines
            if ln.lstrip(" \t").startswith(BULLETS)),
        sum(1 for ln in lines
            if ln.rstrip(" \t").endswith(("...", "…"))),
        sum(1 for w in words if _ALPHA.search(w)),
        sum(1 for s in STOP_WORDS if s in lwords),
    )


@F.pandas_udf(_SCHEMA)
def _gopher_features(texts: pd.Series) -> pd.DataFrame:
    return pd.DataFrame(
        [_features_py(t or "") for t in texts],
        columns=[f.name for f in _SCHEMA.fields])


def gopher_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the rule values + booleans + ``gopher_pass``.  Ratios are
    left unrounded (exact small-int divisions, engine-identical); round
    at presentation if needed."""
    g = F.col("_g")
    nw = g.n_words.cast("double")
    out = (df.withColumn("_g", _gopher_features(F.col(text_col)))
           .withColumn("n_words", g.n_words)
           .withColumn("mean_wlen",
                       F.when(g.n_words > 0, g.word_chars / nw)
                       .otherwise(F.lit(0.0)))
           .withColumn("symbol_ratio",
                       F.when(g.n_words > 0, g.n_symbols / nw)
                       .otherwise(F.lit(0.0)))
           .withColumn("bullet_frac",
                       g.n_bullet / g.n_lines.cast("double"))
           .withColumn("ellipsis_frac",
                       g.n_ellipsis / g.n_lines.cast("double"))
           .withColumn("alpha_frac",
                       F.when(g.n_words > 0, g.n_alpha_words / nw)
                       .otherwise(F.lit(0.0)))
           .withColumn("stop_hits", g.stop_hits)
           .drop("_g"))
    rules = {
        "r_words": (F.col("n_words") >= 50) & (F.col("n_words") <= 100_000),
        "r_wlen": (F.col("mean_wlen") >= 3.0) & (F.col("mean_wlen") <= 10.0),
        "r_symbol": F.col("symbol_ratio") <= 0.1,
        "r_bullet": F.col("bullet_frac") <= 0.90,
        "r_ellipsis": F.col("ellipsis_frac") <= 0.30,
        "r_alpha": F.col("alpha_frac") >= 0.80,
        "r_stop": F.col("stop_hits") >= 2,
    }
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
    passed = None
    for name in rules:
        passed = F.col(name) if passed is None else (passed & F.col(name))
    return out.withColumn("gopher_pass", passed)


def gopher_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only rule-passing documents, original schema."""
    keep = gopher_rules(df, text_col).filter(F.col("gopher_pass"))
    return keep.select(*df.columns)
