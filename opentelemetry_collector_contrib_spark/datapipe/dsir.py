"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw pretraining documents whose hashed-n-gram
feature distribution matches a small high-quality target corpus.

Model (the paper's bag-of-hashed-ngrams estimator):

    feats(d)  = word unigrams ++ bigrams, document order
                (same featurization as quality_clf.py / fastText)
    bucket(g) = H("dsir:" + g) mod B            (hashing trick)
    p[b]      = (count_target[b] + 1) / (N_target + B)   (add-one)
    q[b]      = (count_raw[b]    + 1) / (N_raw    + B)
    logw(d)   = sum_g [ ln p[bucket(g)] - ln q[bucket(g)] ]
                (LEFT-ASSOCIATIVE, gram order — the float-parity
                discipline of lm_score.bigram_logprob)
    resample  = top-k by logw(d) + Gumbel(u_d), u_d a deterministic
                md5 uniform (the curation.weighted_sample recipe) —
                Gumbel-top-k IS sampling-without-replacement
                proportional to softmax(logw), rerun-reproducible.

Scale shape for 10^12 raw documents:
- model fit = one two-phase count aggregation per corpus over exploded
  bucket ids (uniform 32-bit keys, map-side combine; the shuffle
  carries <= B×partitions rows);
- the fitted model is O(B) floats — collected to the driver (B is a
  CONSTANT, independent of corpus size) and shipped in the scoring
  UDF's closure (a broadcast variable at larger B);
- scoring = ONE fused Arrow hop per document (grams, buckets, fold) —
  no join, no shuffle;
- resampling = one global top-k (window here; the partial top-k
  combiner of functions/topk.py is the documented lever at scale).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import _norm_words_py
from .quality_clf import _h32, grams_py

N_BUCKETS = 8192


def bucket(gram: str, n_buckets: int = N_BUCKETS) -> int:
    return _h32("dsir:" + gram) % n_buckets


def _buckets_udf(n_buckets: int):
    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def to_buckets(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def bk(g: str) -> int:
            v = cache.get(g)
            if v is None:
                v = bucket(g, n_buckets)
                cache[g] = v
            return v

        return texts.map(lambda t: [bk(g)
                                    for g in grams_py(_norm_words_py(t))])
    return to_buckets


def bucket_counts(df: DataFrame, text_col: str = "text",
                  n_buckets: int = N_BUCKETS) -> DataFrame:
    """(bucket, n) over the corpus — at most ``n_buckets`` output rows."""
    return (df.select(F.explode(_buckets_udf(n_buckets)(F.col(text_col)))
                      .alias("bucket"))
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n")))


def _log_ratio_list(tc: dict[int, int], rc: dict[int, int],
                    n_buckets: int) -> list[float]:
    """math.log per element (scalar libm), NOT numpy's vectorized log —
    the oracle's ``ln`` must see the identical rounding."""
    nt, nr = sum(tc.values()), sum(rc.values())
    return [math.log((tc.get(b, 0) + 1) / (nt + n_buckets))
            - math.log((rc.get(b, 0) + 1) / (nr + n_buckets))
            for b in range(n_buckets)]


def fit_log_ratios(raw: DataFrame, target: DataFrame,
                   text_col: str = "text",
                   n_buckets: int = N_BUCKETS) -> list[float]:
    """Per-bucket ln p - ln q as a plain O(B) list."""
    def counts(df) -> dict[int, int]:
        return {r["bucket"]: r["n"]
                for r in bucket_counts(df, text_col, n_buckets).collect()}
    return _log_ratio_list(counts(target), counts(raw), n_buckets)


def fit_log_ratios_flagged(docs: DataFrame, target_flag,
                           text_col: str = "text",
                           n_buckets: int = N_BUCKETS) -> list[float]:
    """One-pass twin of :func:`fit_log_ratios` for the common case
    target ⊆ raw (a predicate over the raw corpus, e.g. the curated
    slice): both per-bucket counts come out of a SINGLE explode +
    aggregation — one hashing pass over the corpus instead of two,
    identical counts, identical ln composition."""
    ex = docs.select(
        F.col(target_flag).alias("is_t") if isinstance(target_flag, str)
        else target_flag.alias("is_t"),
        F.explode(_buckets_udf(n_buckets)(F.col(text_col))).alias("bucket"))
    rows = (ex.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("nr"),
                 F.count(F.when(F.col("is_t"), 1)).alias("nt"))
            .collect())
    rc = {r["bucket"]: r["nr"] for r in rows}
    tc = {r["bucket"]: r["nt"] for r in rows if r["nt"]}
    return _log_ratio_list(tc, rc, n_buckets)


def importance_weights(raw: DataFrame, target: DataFrame = None,
                       id_col: str = "doc_id", text_col: str = "text",
                       n_buckets: int = N_BUCKETS,
                       target_flag=None) -> DataFrame:
    """(id, n_grams, logw) per raw document; zero-gram docs score 0.0.

    Pass either ``target`` (a separate target-corpus frame — two fit
    passes) or ``target_flag`` (a boolean column/name over ``raw`` when
    target ⊆ raw — ONE fit pass, same model)."""
    if target_flag is not None:
        llr = fit_log_ratios_flagged(raw, target_flag, text_col, n_buckets)
    else:
        llr = fit_log_ratios(raw, target, text_col, n_buckets)

    @F.pandas_udf(T.StructType([T.StructField("n_grams", T.IntegerType()),
                                T.StructField("logw", T.DoubleType())]))
    def score(texts: pd.Series) -> pd.DataFrame:
        # Two vectorizations over the naive per-gram loop, both
        # value-identical (oracle-checked):
        # - gram->bucket md5 memoized per batch: vocabulary is Zipfian,
        #   so most hash calls are repeats (the _simhash_udf recipe);
        # - the fold is np.cumsum over llr[bs] — cumsum is sequentially
        #   left-associative by definition (out[i] = out[i-1] + x[i]),
        #   so the LAST prefix is bit-identical to the pinned
        #   left-assoc float accumulation the oracle replays.
        import numpy as np
        llr_np = np.asarray(llr, dtype=np.float64)
        cache: dict[str, int] = {}

        def bk(g: str) -> int:
            v = cache.get(g)
            if v is None:
                v = bucket(g, n_buckets)
                cache[g] = v
            return v

        rows = []
        for t in texts:
            gs = grams_py(_norm_words_py(t))
            if not gs:
                rows.append((0, 0.0))
                continue
            bs = np.fromiter((bk(g) for g in gs), dtype=np.int64,
                             count=len(gs))
            rows.append((len(gs), float(np.cumsum(llr_np[bs])[-1])))
        return pd.DataFrame(rows, columns=["n_grams", "logw"])

    s = F.col("_s")
    return (raw.select(F.col(id_col).alias("id"),
                       score(F.col(text_col)).alias("_s"))
            .select("id", s.n_grams.alias("n_grams"),
                    s.logw.alias("logw")))


def dsir_resample(scored: DataFrame, k: int, id_col: str = "id",
                  logw_col: str = "logw") -> DataFrame:
    """Gumbel-top-k over the importance weights: keep the k rows with
    the largest logw + Gumbel(u), u the deterministic md5 uniform of
    the id (rerun/resume-reproducible, the salted-write rule).  This
    samples without replacement proportional to softmax(logw).

    Scale shape: the global top-k runs through the partition-local
    pre-reduce of functions/topk.py (one Arrow hop holding at most k
    rows per partition), so the final exchange carries O(partitions·k)
    rows — never a whole-table sort onto one partition."""
    from ..functions.topk import topk_per_group

    h = F.conv(F.substring(F.md5(F.concat(F.lit("dsirg:"),
                                          F.col(id_col).cast("string"))),
                           1, 15), 16, 10).cast("long")
    u = (h.cast("double") + F.lit(1.0)) / F.lit(float(1 << 60))
    key = F.col(logw_col) - F.log(-F.log(u))
    keyed = (scored.withColumn("gumbel_key", key)
             .withColumn("_g", F.lit(0)))
    return topk_per_group(keyed, ["_g"], "gumbel_key", id_col, k).drop("_g")


def dsir_oracle_sql(words_sql: str, target_pred: str,
                    n_buckets: int = N_BUCKETS,
                    src: str = "documents") -> str:
    """DuckDB twin of importance_weights: same grams, same md5 bucket,
    same add-one model, same ln composition, same left-assoc fold."""
    h = (f"CAST(('0x' || substr(md5('dsir:' || g), 1, 8)) AS BIGINT)"
         f" % {n_buckets}")
    return f"""g AS (
  SELECT doc_id, {words_sql} AS words, ({target_pred}) AS is_t FROM {src}
), gr AS (
  SELECT doc_id, is_t,
         words || list_transform(
           range(1, greatest(len(words), 1)),
           i -> words[i] || ' ' || words[i + 1]) AS grams
  FROM g
), bk AS (
  SELECT doc_id, is_t, list_transform(grams, g -> {h}) AS bs FROM gr
), ex AS (
  SELECT doc_id, is_t, unnest(bs) AS b,
         generate_subscripts(bs, 1) AS pos
  FROM bk
), tc AS (SELECT b, count(*)::BIGINT AS ct FROM ex WHERE is_t GROUP BY b),
rc AS (SELECT b, count(*)::BIGINT AS cr FROM ex GROUP BY b),
tot AS (
  SELECT (SELECT count(*) FROM ex WHERE is_t) AS nt,
         (SELECT count(*) FROM ex) AS nr
), term AS (
  SELECT ex.doc_id, ex.pos,
         ln((coalesce(tc.ct, 0) + 1)
            / CAST(tot.nt + {n_buckets} AS DOUBLE))
         - ln((coalesce(rc.cr, 0) + 1)
              / CAST(tot.nr + {n_buckets} AS DOUBLE)) AS t
  FROM ex LEFT JOIN tc USING (b) LEFT JOIN rc USING (b) CROSS JOIN tot
), agg AS (
  SELECT doc_id, CAST(count(*) AS INT) AS n_grams,
         list(t ORDER BY pos) AS ts
  FROM term GROUP BY doc_id
)
SELECT g.doc_id AS id, coalesce(agg.n_grams, 0) AS n_grams,
       CASE WHEN agg.doc_id IS NULL THEN 0.0
            ELSE round(list_reduce(agg.ts, (a, b) -> a + b), 6)
       END AS logw
FROM g LEFT JOIN agg USING (doc_id)"""
