"""Gopher repetition-rule battery — the second half of table A1
(Rae et al. 2021, arXiv:2112.11446): filters for documents dominated
by repeated lines, paragraphs, or word n-grams.  Together with
quality_rules.py (the 7 doc-level heuristics) this completes the
published Gopher filter set.

Rules (exact public thresholds), each emitted value + boolean:

- ``dup_line_frac``        <= 0.30   fraction of line slots that are a
- ``dup_para_frac``        <= 0.30   repeat of an earlier identical
                                     line/paragraph: (n - n_distinct)/n
- ``dup_line_char_frac``   <= 0.20   same, weighted by characters:
- ``dup_para_char_frac``   <= 0.20   (chars_all - chars_distinct)/chars_all
- ``top2_char_frac``       <= 0.20   fraction of word characters covered
- ``top3_char_frac``       <= 0.18   by the most frequent word n-gram
- ``top4_char_frac``       <= 0.16   (occurrences x gram chars / total)
- ``dup5_char_frac``       <= 0.15   fraction of word characters lying
- ``dup6_char_frac``       <= 0.14   inside ANY occurrence of a
- ``dup7_char_frac``       <= 0.13   duplicated n-gram (position-set
- ``dup8_char_frac``       <= 0.12   union, so overlaps are not
- ``dup9_char_frac``       <= 0.11   double-counted)
- ``dup10_char_frac``      <= 0.10

``repetition_pass`` is the AND of all 13.

Pinned conventions (so the DuckDB oracle twin is expressible verbatim):
words split on ASCII whitespace (the quality_rules.py convention);
lines = split on LF, paragraphs = split on LF LF, both dropping
elements that are empty after a full-whitespace trim; n-gram identity
is the space-joined word tuple (words contain no spaces, so the join
is injective) and its char length is ``len(join) - (n-1)``; among
equally most-frequent n-grams the one with the most characters wins
(ties are then value-identical).  A top n-gram occurring only once is
no repetition signal — its fraction is 0.0 (otherwise every short
document fails the rule by construction); overlapping occurrences of
the top gram are counted per-occurrence as published, clamped to 1.
All fractions are exact integer-count divisions rounded to 6 at
presentation — bit-identical across engines.

Scale design: ONE fused Arrow hop per document computing all 13 values
(the quality_rules.py discipline), then pure-codegen thresholding.
Shuffles: none — the op is a projection; at 10^12 docs it pipelines
with the scan.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_WS = re.compile(r"[ \t\n\r\f\v]+")

TOP_THRESH = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_THRESH = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}

_FIELDS = (["dup_line_frac", "dup_para_frac",
            "dup_line_char_frac", "dup_para_char_frac"]
           + [f"top{n}_char_frac" for n in TOP_THRESH]
           + [f"dup{n}_char_frac" for n in DUP_THRESH])

_SCHEMA = T.StructType(
    [T.StructField(f, T.DoubleType()) for f in _FIELDS])


def _dup_fracs(elems: list[str]) -> tuple[float, float]:
    if not elems:
        return 0.0, 0.0
    n = len(elems)
    chars = sum(len(e) for e in elems)
    distinct = set(elems)
    dchars = sum(len(e) for e in distinct)
    return ((n - len(distinct)) / n,
            (chars - dchars) / chars if chars else 0.0)


def _features_py(text: str) -> tuple:
    # ASCII whitespace only — str.strip() trims the full Unicode set,
    # but the DuckDB oracle's trim() covers only these six chars; a
    # U+00A0-only line must count as non-empty in BOTH engines
    lines = [ln for ln in text.split("\n") if ln.strip(" \t\n\r\f\v")]
    paras = [p for p in text.split("\n\n") if p.strip(" \t\n\r\f\v")]
    lf, lcf = _dup_fracs(lines)
    pf, pcf = _dup_fracs(paras)
    words = [w for w in _WS.split(text) if w]
    wlens = [len(w) for w in words]
    total = sum(wlens)
    out = [lf, pf, lcf, pcf]
    for n in TOP_THRESH:
        if total == 0 or len(words) < n:
            out.append(0.0)
            continue
        counts = Counter(" ".join(words[i:i + n])
                         for i in range(len(words) - n + 1))
        mc = max(counts.values())
        if mc < 2:
            out.append(0.0)
            continue
        best = max(len(g) - (n - 1)
                   for g, c in counts.items() if c == mc)
        out.append(min(1.0, mc * best / total))
    for n in DUP_THRESH:
        if total == 0 or len(words) < n:
            out.append(0.0)
            continue
        grams = [" ".join(words[i:i + n])
                 for i in range(len(words) - n + 1)]
        counts = Counter(grams)
        covered: set[int] = set()
        for i, g in enumerate(grams):
            if counts[g] > 1:
                covered.update(range(i, i + n))
        out.append(sum(wlens[j] for j in covered) / total)
    return tuple(out)


@F.pandas_udf(_SCHEMA)
def _repetition_features(texts: pd.Series) -> pd.DataFrame:
    return pd.DataFrame([_features_py(t or "") for t in texts],
                        columns=_FIELDS)


def repetition_rules(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the 13 fraction values (rounded 6), booleans, and
    ``repetition_pass``."""
    g = F.col("_r")
    out = df.withColumn("_r", _repetition_features(F.col(text_col)))
    conds = []
    for f in _FIELDS:
        out = out.withColumn(f, F.round(g[f], 6))
    for f, thresh in [("dup_line_frac", 0.30), ("dup_para_frac", 0.30),
                      ("dup_line_char_frac", 0.20),
                      ("dup_para_char_frac", 0.20),
                      *[(f"top{n}_char_frac", t)
                        for n, t in TOP_THRESH.items()],
                      *[(f"dup{n}_char_frac", t)
                        for n, t in DUP_THRESH.items()]]:
        out = out.withColumn(f"r_{f}", F.col(f) <= thresh)
        conds.append(F.col(f"r_{f}"))
    passed = conds[0]
    for c in conds[1:]:
        passed = passed & c
    return out.drop("_r").withColumn("repetition_pass", passed)


def repetition_filter(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep only rule-passing documents, original schema."""
    keep = repetition_rules(df, text_col).filter(F.col("repetition_pass"))
    return keep.select(*df.columns)


# ---------------------------------------------------------------------------
# DuckDB oracle twin
# ---------------------------------------------------------------------------

def _gram_sql(n: int) -> str:
    parts = " || ' ' || ".join(f"words[i + {k}]" for k in range(n))
    return (f"list_transform(range(1, greatest(len(words) - {n} + 2, 1)),"
            f" i -> {parts})")


def repetition_oracle_sql(src: str = "documents") -> str:
    """The identical 13 fractions in DuckDB SQL over ``src(doc_id,
    text)`` — generated CTE chain per n-gram size, position-set union
    for the dup coverage (no overlap double-count)."""
    ws = ("' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)")
    base = f"""rw AS (
  SELECT doc_id,
    list_filter(string_split(text, chr(10)),
                l -> trim(l, {ws}) <> '') AS lines,
    list_filter(string_split(text, chr(10) || chr(10)),
                p -> trim(p, {ws}) <> '') AS paras,
    list_filter(regexp_split_to_array(text, '[ \t\n\r\f\v]+'),
                w -> w <> '') AS words
  FROM {src}
), rtot AS (
  SELECT doc_id,
    coalesce(list_sum(list_transform(words, w -> length(w))), 0) AS twc
  FROM rw
), rdup AS (
  SELECT doc_id,
    CASE WHEN len(lines) = 0 THEN 0.0
         ELSE (len(lines) - len(list_distinct(lines)))
              / CAST(len(lines) AS DOUBLE) END AS dup_line_frac,
    CASE WHEN len(paras) = 0 THEN 0.0
         ELSE (len(paras) - len(list_distinct(paras)))
              / CAST(len(paras) AS DOUBLE) END AS dup_para_frac,
    CASE WHEN coalesce(list_sum(list_transform(lines,
                                               l -> length(l))), 0) = 0
         THEN 0.0
         ELSE (list_sum(list_transform(lines, l -> length(l)))
               - list_sum(list_transform(list_distinct(lines),
                                         l -> length(l))))
              / CAST(list_sum(list_transform(lines, l -> length(l)))
                     AS DOUBLE) END AS dup_line_char_frac,
    CASE WHEN coalesce(list_sum(list_transform(paras,
                                               p -> length(p))), 0) = 0
         THEN 0.0
         ELSE (list_sum(list_transform(paras, p -> length(p)))
               - list_sum(list_transform(list_distinct(paras),
                                         p -> length(p))))
              / CAST(list_sum(list_transform(paras, p -> length(p)))
                     AS DOUBLE) END AS dup_para_char_frac
  FROM rw
)"""
    ctes = [base]
    for n in TOP_THRESH:
        ctes.append(f"""rg{n} AS (
  SELECT doc_id, gram, count(*) AS c, length(gram) - {n - 1} AS gc
  FROM (SELECT doc_id, unnest({_gram_sql(n)}) AS gram FROM rw)
  GROUP BY doc_id, gram
), rtop{n} AS (
  SELECT doc_id, max(c * gc) AS topv
  FROM (SELECT doc_id, c, gc,
               max(c) OVER (PARTITION BY doc_id) AS mc FROM rg{n})
  WHERE c = mc AND c > 1 GROUP BY doc_id
)""")
    for n in DUP_THRESH:
        ctes.append(f"""rp{n} AS (
  SELECT doc_id, gram, i FROM (
    SELECT doc_id, unnest(g) AS gram, generate_subscripts(g, 1) AS i
    FROM (SELECT doc_id, {_gram_sql(n)} AS g FROM rw))
), rc{n} AS (
  SELECT doc_id, gram FROM rp{n} GROUP BY doc_id, gram
  HAVING count(*) > 1
), rcov{n} AS (
  SELECT DISTINCT p.doc_id, p.i + k.k AS pos
  FROM rp{n} p JOIN rc{n} c USING (doc_id, gram)
  CROSS JOIN (SELECT unnest(range(0, {n})) AS k) k
), rdv{n} AS (
  SELECT v.doc_id, sum(length(w.words[v.pos])) AS cov
  FROM rcov{n} v JOIN rw w USING (doc_id) GROUP BY v.doc_id
)""")
    tops = ",\n  ".join(
        f"round(CASE WHEN t.twc = 0 THEN 0.0 ELSE "
        f"least(1.0, coalesce(rtop{n}.topv, 0) / CAST(t.twc AS DOUBLE)) "
        f"END, 6) AS top{n}_char_frac" for n in TOP_THRESH)
    dups = ",\n  ".join(
        f"round(CASE WHEN t.twc = 0 THEN 0.0 ELSE "
        f"coalesce(rdv{n}.cov, 0) / CAST(t.twc AS DOUBLE) END, 6) "
        f"AS dup{n}_char_frac" for n in DUP_THRESH)
    joins = "".join(
        f"\n  LEFT JOIN rtop{n} USING (doc_id)" for n in TOP_THRESH) + \
        "".join(f"\n  LEFT JOIN rdv{n} USING (doc_id)" for n in DUP_THRESH)
    return (",\n".join(ctes) + f""",
rvals AS (
  SELECT d.doc_id,
  round(d.dup_line_frac, 6) AS dup_line_frac,
  round(d.dup_para_frac, 6) AS dup_para_frac,
  round(d.dup_line_char_frac, 6) AS dup_line_char_frac,
  round(d.dup_para_char_frac, 6) AS dup_para_char_frac,
  {tops},
  {dups}
  FROM rdup d JOIN rtot t USING (doc_id){joins}
)""")
