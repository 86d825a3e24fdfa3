"""fastText-style quality classifier: hashed bag-of-n-grams linear model.

Architecture follows Joulin et al., "Bag of Tricks for Efficient Text
Classification" (arXiv:1607.01759), the model behind the quality /
wiki-vs-crawl filters of CCNet and the GPT-3 / LLaMA data pipelines:
word unigrams + bigrams -> hashing trick into B buckets -> linear
layer -> logit.  Trained weights are a broadcastable float vector; to
stay oracle-checkable this ships a deterministic seeded weight per
bucket (same md5 recipe as :mod:`.hashing` — a production deployment
swaps in the trained vector and loses only DuckDB portability).

Model:
    grams(d)  = unigrams(d) ++ bigrams(d)          (document order)
    bucket(g) = H("ft:" + g)  mod B                (hashing trick)
    w(j)      = (H("ftw:" + j) mod 2001 - 1000)/1000   in [-1, 1]
    logit(d)  = sum_g w(bucket(g)) / |grams(d)|    (left-assoc fold)
    label(d)  = logit > 0

The LOGIT (pure rational arithmetic, bit-identical across engines) is
the checked output; the sigmoid is applied only in the Python helper
(cross-engine ``exp`` can differ in the last ulp).

Scale shape: ONE Arrow hop per document (grams + hashes + fold in a
single pandas UDF — the same fused-hop pattern as textstats), zero
shuffles; the model itself is O(B) and rides to executors inside the
UDF closure (a trained vector would go via ``SparkContext.broadcast``).
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _norm_words_py

N_BUCKETS = 1 << 20


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def bucket(gram: str, n_buckets: int = N_BUCKETS) -> int:
    return _h32("ft:" + gram) % n_buckets


def weight(j: int) -> float:
    return (_h32(f"ftw:{j}") % 2001 - 1000) / 1000.0


def grams_py(words: list[str]) -> list[str]:
    """Unigrams then bigrams, document order (fastText featurization)."""
    return words + [f"{a} {b}" for a, b in zip(words, words[1:])]


def logit_py(text: str | None, n_buckets: int = N_BUCKETS) -> tuple:
    """Python twin: (n_grams, logit)."""
    gs = grams_py(_norm_words_py(text))
    if not gs:
        return 0, 0.0
    acc = 0.0
    for g in gs:                       # left-assoc, document order
        acc += weight(bucket(g, n_buckets))
    return len(gs), acc / len(gs)


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


_CLF_TYPE = T.StructType([
    T.StructField("n_grams", T.IntegerType()),
    T.StructField("logit", T.DoubleType()),
])


def _clf_udf(n_buckets: int):
    @F.pandas_udf(_CLF_TYPE)
    def clf(texts: pd.Series) -> pd.DataFrame:
        rows = [logit_py(t, n_buckets) for t in texts]
        return pd.DataFrame(rows, columns=["n_grams", "logit"])
    return clf


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   n_buckets: int = N_BUCKETS) -> DataFrame:
    """Per-document classifier output:
    (doc_id, n_grams, logit rounded to 6, label)."""
    u = _clf_udf(n_buckets)
    out = df.select(F.col(id_col).alias("doc_id"),
                    u(F.col(text_col)).alias("_c"))
    logit = F.round(F.col("_c.logit"), 6)
    return out.select(
        "doc_id", F.col("_c.n_grams").alias("n_grams"),
        logit.alias("logit"),
        (F.col("_c.logit") > 0).alias("label"))


# ---------------------------------------------------------------------------
# DuckDB oracle builder
# ---------------------------------------------------------------------------

def quality_oracle_sql(words_sql: str, n_buckets: int = N_BUCKETS) -> str:
    """CTE chain over ``documents`` reproducing the model exactly:
    same gram order, same md5 bucket/weight derivation, same
    left-associative fold."""
    h = ("CAST(('0x' || substr(md5('ft:' || g), 1, 8)) AS BIGINT)"
         f" % {n_buckets}")
    w = ("(CAST(('0x' || substr(md5('ftw:' || CAST(b AS VARCHAR)), 1, 8))"
         " AS BIGINT) % 2001 - 1000) / 1000.0")
    return f"""g AS (
  SELECT doc_id, {words_sql} AS words FROM documents
), gr AS (
  SELECT doc_id,
         words || list_transform(
           range(1, greatest(len(words), 1)),
           i -> words[i] || ' ' || words[i + 1]) AS grams
  FROM g
), bw AS (
  SELECT doc_id, grams,
         list_transform(
           list_transform(grams, g -> {h}),
           b -> {w}) AS ws
  FROM gr
)
SELECT doc_id, CAST(len(grams) AS INT) AS n_grams,
       CASE WHEN len(grams) = 0 THEN 0.0
            ELSE round(list_reduce(ws, (a, b) -> a + b) / len(grams), 6)
       END AS logit,
       CASE WHEN len(grams) = 0 THEN FALSE
            ELSE list_reduce(ws, (a, b) -> a + b) / len(grams) > 0
       END AS label
FROM bw"""
