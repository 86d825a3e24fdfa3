"""C4 cleaning rules — the public filter battery from Raffel et al.
2020 (arXiv:1910.10683 §2.2, the "Colossal Clean Crawled Corpus"):
line-level keep rules plus page-level drop rules, the second canonical
curation set next to the Gopher batteries (quality_rules.py,
repetition.py).

Line rules (a line is KEPT iff all hold):
- ends in a terminal punctuation mark (``. ! ? "``, after
  space/tab rstrip) — the paper's "terminal punctuation" rule;
- has at least ``min_words_per_line`` (default 5) whitespace words;
- does not contain "javascript" (case-insensitive).

Page rules (computed on the ORIGINAL text; the page is KEPT iff):
- at least ``min_sentences`` (default 3) sentences survive in the
  kept lines — sentence count pinned as the number of ``. ! ?``
  characters in the kept text (a deterministic cross-engine proxy for
  the paper's sentence splitter);
- does not contain "lorem ipsum" (case-insensitive);
- does not contain a curly brace ``{`` (code);
- no whitespace-delimited word, lowercased and stripped of leading/
  trailing punctuation, is in the blocklist (the paper uses the
  public LDNOOBW list; the default here is a tiny stand-in —
  pass the full list via ``badwords``).

Output per doc: ``kept_text`` (kept lines joined by LF), line/sentence
counts, the four page flags, and ``c4_keep``.

Scale design: ONE fused Arrow hop per document (the gopher batteries'
discipline), zero shuffles; thresholding is codegen.  The 3-sentence
span dedup that C4 applies corpus-wide is a separate corpus-level op —
that shape lives in line_dedup (CCNet) / remove_dup_spans.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TERMINALS = ('.', '!', '?', '"')
DEFAULT_BADWORDS = ("porn", "xxx", "sex")
_WS = re.compile(r"[ \t\n\r\f\v]+")
_PUNCT = " \t.,;:!?\"'()[]{}"

_SCHEMA = T.StructType([
    T.StructField("kept_text", T.StringType()),
    T.StructField("n_lines", T.LongType()),
    T.StructField("n_kept", T.LongType()),
    T.StructField("n_sentences", T.LongType()),
    T.StructField("has_lorem", T.BooleanType()),
    T.StructField("has_brace", T.BooleanType()),
    T.StructField("has_badword", T.BooleanType()),
])


def _line_kept(line: str, min_words: int) -> bool:
    t = line.rstrip(" \t")
    if not t.endswith(TERMINALS):
        return False
    if len([w for w in _WS.split(line) if w]) < min_words:
        return False
    return "javascript" not in line.lower()


def _features_py(text: str, min_words: int,
                 badwords: frozenset[str]) -> tuple:
    lines = text.split("\n")
    kept = [ln for ln in lines if _line_kept(ln, min_words)]
    kept_text = "\n".join(kept)
    lower = text.lower()
    words = {w.strip(_PUNCT) for w in _WS.split(lower)}
    return (
        kept_text,
        len(lines),
        len(kept),
        sum(kept_text.count(c) for c in ".!?"),
        "lorem ipsum" in lower,
        "{" in text,
        not words.isdisjoint(badwords),
    )


def c4_rules(df: DataFrame, text_col: str = "text",
             min_words_per_line: int = 5, min_sentences: int = 3,
             badwords: tuple[str, ...] = DEFAULT_BADWORDS) -> DataFrame:
    """Append kept_text, the counts, the page flags, and ``c4_keep``."""
    bw = frozenset(badwords)

    @F.pandas_udf(_SCHEMA)
    def feats(texts: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_features_py(t or "", min_words_per_line, bw)
             for t in texts],
            columns=[f.name for f in _SCHEMA.fields])

    g = F.col("_c4")
    out = df.withColumn("_c4", feats(F.col(text_col)))
    for f in _SCHEMA.fieldNames():
        out = out.withColumn(f, g[f])
    return (out.drop("_c4")
            .withColumn("c4_keep",
                        (F.col("n_sentences") >= min_sentences)
                        & ~F.col("has_lorem") & ~F.col("has_brace")
                        & ~F.col("has_badword")))


def c4_filter(df: DataFrame, text_col: str = "text", **kw) -> DataFrame:
    """Keep passing pages with their CLEANED text substituted in (the
    C4 output corpus is the kept lines, not the raw page)."""
    out = c4_rules(df, text_col, **kw).filter(F.col("c4_keep"))
    cols = [F.col("kept_text").alias(text_col) if c == text_col
            else F.col(c) for c in df.columns]
    return out.select(*cols)


def c4_oracle_sql(src: str = "documents",
                  min_words_per_line: int = 5, min_sentences: int = 3,
                  badwords: tuple[str, ...] = DEFAULT_BADWORDS) -> str:
    """DuckDB twin: identical line predicate, sentence proxy, and
    word-strip badword membership."""
    terms = " OR ".join(
        f"ends_with(rtrim(l, ' ' || chr(9)), '{t}')" if t != '"'
        else "ends_with(rtrim(l, ' ' || chr(9)), chr(34))"
        for t in TERMINALS)
    bw = ", ".join(f"'{w}'" for w in badwords)
    # NB: no backslash escapes inside SQL strings — tab via chr(9),
    # the single quote via '' doubling
    punct = ("' ' || chr(9) || '.,;:!?' || chr(34) || '''' || '()[]{}'")
    return f"""c4l AS (
  SELECT doc_id, text,
    list_filter(string_split(text, chr(10)), l ->
      ({terms})
      AND len(list_filter(regexp_split_to_array(l, '[ \t\n\r\f\v]+'),
                          w -> w <> '')) >= {min_words_per_line}
      AND NOT contains(lower(l), 'javascript')) AS kept,
    len(string_split(text, chr(10))) AS n_lines
  FROM {src}
), c4k AS (
  SELECT doc_id, text, n_lines,
    coalesce(array_to_string(kept, chr(10)), '') AS kept_text,
    len(kept) AS n_kept
  FROM c4l
), c4v AS (
  SELECT doc_id, kept_text, n_lines, n_kept,
    (length(kept_text) - length(replace(kept_text, '.', '')))
    + (length(kept_text) - length(replace(kept_text, '!', '')))
    + (length(kept_text) - length(replace(kept_text, '?', '')))
      AS n_sentences,
    contains(lower(text), 'lorem ipsum') AS has_lorem,
    contains(text, '{{') AS has_brace,
    len(list_filter(
      list_transform(
        list_filter(regexp_split_to_array(lower(text),
                                          '[ \t\n\r\f\v]+'),
                    w -> w <> ''),
        w -> trim(w, {punct})),
      w -> w IN ({bw}))) > 0 AS has_badword
  FROM c4k
)"""
