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


def logit_py(text: str | None, n_buckets: int = N_BUCKETS,
             W=None) -> tuple:
    """Python twin: (n_grams, logit).  ``W`` (length-n_buckets array)
    drops in TRAINED weights; default = the seeded per-bucket hash."""
    gs = grams_py(_norm_words_py(text))
    if not gs:
        return 0, 0.0
    acc = 0.0
    for g in gs:                       # left-assoc, document order
        j = bucket(g, n_buckets)
        acc += weight(j) if W is None else float(W[j])
    return len(gs), acc / len(gs)


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


_CLF_TYPE = T.StructType([
    T.StructField("n_grams", T.IntegerType()),
    T.StructField("logit", T.DoubleType()),
])


def _clf_udf(n_buckets: int, W=None):
    @F.pandas_udf(_CLF_TYPE)
    def clf(texts: pd.Series) -> pd.DataFrame:
        rows = [logit_py(t, n_buckets, W) for t in texts]
        return pd.DataFrame(rows, columns=["n_grams", "logit"])
    return clf


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   n_buckets: int = N_BUCKETS, weights=None) -> DataFrame:
    """Per-document classifier output:
    (doc_id, n_grams, logit rounded to 6, label).  ``weights`` drops
    in a trained vector (`fit_quality_clf`) — closure-captured, so it
    ships to executors with the task (O(n_buckets) floats); the seeded
    default stays DuckDB-checkable."""
    u = _clf_udf(n_buckets, weights)
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


# ---------------------------------------------------------------------------
# trained weights (the production drop-in for the seeded stand-in)
# ---------------------------------------------------------------------------

def fit_quality_clf(df: DataFrame, label_col: str = "label",
                    text_col: str = "text", n_buckets: int = N_BUCKETS,
                    sample_n: int = 65536, epochs: int = 20,
                    lr: float = 2.0, id_col: str = "doc_id"):
    """Fit the fastText-style linear layer on a BOUNDED labeled sample
    (full-batch logistic regression over the hashed mean-of-grams
    features — the same featurization `quality_scores` applies, so the
    trained vector is an exact drop-in via its ``weights`` param).

    The sample is the ``sample_n`` smallest ids (deterministic; feed a
    `dedup.hash_sample` for production corpora).  Driver memory:
    n_buckets floats + the sampled gram index lists — the corpus is
    never collected.  Returns the weight ndarray.
    """
    import numpy as np
    rows = (df.select(id_col, text_col, label_col).orderBy(id_col)
            .limit(sample_n).collect())
    feats = []     # per-doc bucket index array
    y = np.array([1.0 if r[2] else 0.0 for r in rows])
    for r in rows:
        gs = grams_py(_norm_words_py(r[1]))
        feats.append(np.array([bucket(g, n_buckets) for g in gs],
                              dtype=np.int64))
    W = np.zeros(n_buckets)
    for _ in range(epochs):
        grad = np.zeros(n_buckets)
        for idx, yi in zip(feats, y):
            if len(idx) == 0:
                continue
            p = 1.0 / (1.0 + math.exp(-float(W[idx].sum() / len(idx))))
            np.add.at(grad, idx, (p - yi) / len(idx))
        W -= lr * grad / max(len(rows), 1)
    return W
