"""Tokens-NATIVE quality battery: Gopher-style repetition/diversity
filters computed directly over the north-rule input
(``tokens: array<int32>``) with NO detokenize hop.

The text-side batteries (``quality_rules.py``, ``repetition.py``,
arXiv:2112.11446 table A1) need the decoded body; on pre-tokenized
training data the cheap signals — sequence length, vocabulary
diversity, degenerate repetition — are ALREADY visible in the token
ids, so a 10^12-sequence pre-filter can run before (and drastically
shrink) any decode stage.  Signals per document:

- ``n_distinct`` / ``distinct_ratio`` — vocabulary diversity (the
  token-space analog of Gopher's unique-word fraction);
- ``top_token``/``top_count``/``top_token_frac`` — mode concentration
  (degenerate generations repeat one token);
- ``max_run`` — longest run of IDENTICAL consecutive tokens (the
  classic stuck-decoder signature);
- ``dup_{k}gram_pos`` / ``dup_gram_frac`` — fraction of k-gram
  positions whose k-gram occurs more than once WITHIN the doc
  (token-space analog of Gopher's dup-n-gram character fractions).

Thresholds are this engine's own defaults (token space has no
published exact table); each flag and the AND (`keep`) are emitted so
a pipeline can re-threshold without recomputing.

Scale shape: ONE Arrow hop per batch emitting fixed-width integer
counts — no shuffle, no join, perfectly data-parallel; ratios, flags
and rounding stay in Catalyst so the DuckDB oracle's decimal behavior
matches exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_COUNTS_TYPE = T.StructType([
    T.StructField("n_distinct", T.IntegerType()),
    T.StructField("top_token", T.IntegerType()),
    T.StructField("top_count", T.IntegerType()),
    T.StructField("max_run", T.IntegerType()),
    T.StructField("dup_gram_pos", T.IntegerType()),
])


def _counts_one(toks, k: int):
    if toks is None or len(toks) == 0:
        return (0, None, 0, 0, 0)
    a = np.asarray(toks, dtype=np.int64)
    n = a.size
    uniq, counts = np.unique(a, return_counts=True)
    top = int(counts.max())
    top_tok = int(uniq[counts == top].min())    # deterministic tie-break
    # longest run of equal consecutive tokens: change-point indices
    change = np.flatnonzero(a[1:] != a[:-1])
    edges = np.concatenate(([-1], change, [n - 1]))
    max_run = int(np.diff(edges).max())
    dup_pos = 0
    if n >= k:
        w = np.ascontiguousarray(
            np.lib.stride_tricks.sliding_window_view(a, k))
        wv = w.view([("", a.dtype)] * k).ravel()
        _, gc = np.unique(wv, return_counts=True)
        dup_pos = int(gc[gc >= 2].sum())
    return (len(uniq), top_tok, top, max_run, dup_pos)


def _counts_batch2(tokens: pd.Series) -> pd.DataFrame:
    """Vectorized k=2 twin of ``[_counts_one(t, 2) for t in batch]``:
    the whole Arrow batch is flattened once and every signal comes from
    segmented numpy ops (lexsort + run-length encoding) — no per-doc
    Python.  Bit-identical to the per-doc path (pinned in tests)."""
    arrays = [np.asarray(t if t is not None else (), dtype=np.int64)
              for t in tokens]
    n_docs = len(arrays)
    lens = np.fromiter((a.size for a in arrays), dtype=np.int64,
                       count=n_docs)
    nd = np.zeros(n_docs, dtype=np.int64)
    tt = np.zeros(n_docs, dtype=np.int64)
    tc_ = np.zeros(n_docs, dtype=np.int64)
    mr = np.zeros(n_docs, dtype=np.int64)
    dp = np.zeros(n_docs, dtype=np.int64)
    if lens.sum() > 0:
        flat = np.concatenate([a for a in arrays if a.size])
        seg = np.repeat(np.arange(n_docs), lens)
        # (seg, token) groups -> n_distinct, top_count, top_token
        order = np.lexsort((flat, seg))
        fs, ss = flat[order], seg[order]
        new = np.empty(fs.size, dtype=bool)
        new[0] = True
        new[1:] = (fs[1:] != fs[:-1]) | (ss[1:] != ss[:-1])
        gidx = np.flatnonzero(new)
        gseg, gtok = ss[gidx], fs[gidx]
        gcnt = np.diff(np.append(gidx, fs.size))
        np.add.at(nd, gseg, 1)
        # per-seg argmax count with min-token tie-break: order groups
        # by (seg, -cnt, tok) and take each seg's first row
        go = np.lexsort((gtok, -gcnt, gseg))
        gs2 = gseg[go]
        first = np.empty(gs2.size, dtype=bool)
        first[0] = True
        first[1:] = gs2[1:] != gs2[:-1]
        fi = np.flatnonzero(first)
        tc_[gs2[fi]] = gcnt[go][fi]
        tt[gs2[fi]] = gtok[go][fi]
        # longest equal-token run (runs break at doc boundaries)
        ch = np.empty(flat.size, dtype=bool)
        ch[0] = True
        ch[1:] = (flat[1:] != flat[:-1]) | (seg[1:] != seg[:-1])
        ridx = np.flatnonzero(ch)
        rlen = np.diff(np.append(ridx, flat.size))
        np.maximum.at(mr, seg[ridx], rlen)
        # duplicated 2-gram positions: encode the pair as one uint64.
        # Shifted offsets are < 2^32 for any int32 ids (including
        # negatives), so (a*width + b) <= 2^64 - 1 — exact in uint64,
        # where a signed-int64 product could silently wrap and collide
        # distinct 2-grams.
        valid = seg[1:] == seg[:-1]
        if valid.any():
            lo = flat.min()
            width = np.uint64(flat.max() - lo + 1)
            enc = ((flat[:-1][valid] - lo).astype(np.uint64) * width
                   + (flat[1:][valid] - lo).astype(np.uint64))
            gs = seg[:-1][valid]
            o2 = np.lexsort((enc, gs))
            es, ess = enc[o2], gs[o2]
            new2 = np.empty(es.size, dtype=bool)
            new2[0] = True
            new2[1:] = (es[1:] != es[:-1]) | (ess[1:] != ess[:-1])
            g2 = np.flatnonzero(new2)
            c2 = np.diff(np.append(g2, es.size))
            dupg = c2 >= 2
            np.add.at(dp, ess[g2][dupg], c2[dupg])
    out = pd.DataFrame({
        "n_distinct": nd.astype("int32"),
        "top_token": pd.array(tt, dtype="Int32"),
        "top_count": tc_.astype("int32"),
        "max_run": mr.astype("int32"),
        "dup_gram_pos": dp.astype("int32"),
    })
    out.loc[lens == 0, "top_token"] = pd.NA
    return out


def _token_counts_udf(k: int):
    @F.pandas_udf(_COUNTS_TYPE)
    def tc(tokens: pd.Series) -> pd.Series:
        if k == 2:
            return _counts_batch2(tokens)
        rows = [_counts_one(t, k) for t in tokens]
        return pd.DataFrame(
            rows, columns=["n_distinct", "top_token", "top_count",
                           "max_run", "dup_gram_pos"])
    return tc


def token_quality(df: DataFrame, k: int = 2,
                  tokens_col: str = "tokens", id_col: str = "doc_id",
                  min_tok: int = 8, max_tok: int = 8192,
                  min_distinct_ratio: float = 0.2,
                  max_run_len: int = 20,
                  max_dup_gram_frac: float = 0.5) -> DataFrame:
    """Per-doc token-space quality signals + threshold flags (see
    module docstring).  ONE Arrow hop; ratios/flags in Catalyst."""
    # NULL arrays count 0 tokens on BOTH engines: bare F.size is -1
    # under non-ANSI Spark and NULL under ANSI, either of which
    # diverges from the Python twin / DuckDB oracle (len -> 0/NULL)
    n_tok = F.when(F.col(tokens_col).isNull(), F.lit(0)) \
        .otherwise(F.size(F.col(tokens_col)))
    c = _token_counts_udf(k)(F.col(tokens_col))
    out = (df.select(F.col(id_col).alias("id"),
                     n_tok.alias("n_tok"), c.alias("_c"))
           .select("id", "n_tok",
                   F.col("_c.n_distinct").alias("n_distinct"),
                   F.col("_c.top_token").alias("top_token"),
                   F.col("_c.top_count").alias("top_count"),
                   F.col("_c.max_run").alias("max_run"),
                   F.col("_c.dup_gram_pos").alias("dup_gram_pos")))
    n_gram_pos = F.greatest(F.col("n_tok") - (k - 1), F.lit(0))
    nz = F.col("n_tok") > 0
    distinct_ratio = F.when(
        nz, F.col("n_distinct").cast("double") / F.col("n_tok")) \
        .otherwise(F.lit(0.0))
    top_frac = F.when(
        nz, F.col("top_count").cast("double") / F.col("n_tok")) \
        .otherwise(F.lit(0.0))
    dup_frac = F.when(
        n_gram_pos > 0,
        F.col("dup_gram_pos").cast("double") / n_gram_pos) \
        .otherwise(F.lit(0.0))
    out = (out.withColumn("n_gram_pos", n_gram_pos.cast("int"))
           .withColumn("distinct_ratio", F.round(distinct_ratio, 6))
           .withColumn("top_token_frac", F.round(top_frac, 6))
           .withColumn("dup_gram_frac", F.round(dup_frac, 6)))
    ok_length = (F.col("n_tok") >= min_tok) & (F.col("n_tok") <= max_tok)
    ok_distinct = F.col("distinct_ratio") >= min_distinct_ratio
    ok_run = F.col("max_run") <= max_run_len
    ok_dup = F.col("dup_gram_frac") <= max_dup_gram_frac
    return (out.withColumn("ok_length", ok_length)
            .withColumn("ok_distinct", ok_distinct)
            .withColumn("ok_run", ok_run)
            .withColumn("ok_dup", ok_dup)
            .withColumn("keep",
                        ok_length & ok_distinct & ok_run & ok_dup))


def token_quality_py(toks, k: int = 2, min_tok: int = 8,
                     max_tok: int = 8192,
                     min_distinct_ratio: float = 0.2,
                     max_run_len: int = 20,
                     max_dup_gram_frac: float = 0.5) -> dict:
    """Pure-Python twin of one row (parity tests)."""
    n = 0 if toks is None else len(toks)
    nd, tt, tc_, mr, dp = _counts_one(toks, k)
    ngp = max(n - (k - 1), 0)
    dr = round(nd / n, 6) if n else 0.0
    tf = round(tc_ / n, 6) if n else 0.0
    df_ = round(dp / ngp, 6) if ngp else 0.0
    okl = min_tok <= n <= max_tok
    okd = dr >= min_distinct_ratio
    okr = mr <= max_run_len
    okg = df_ <= max_dup_gram_frac
    return {"n_tok": n, "n_distinct": nd, "top_token": tt,
            "top_count": tc_, "max_run": mr, "dup_gram_pos": dp,
            "n_gram_pos": ngp, "distinct_ratio": dr,
            "top_token_frac": tf, "dup_gram_frac": df_,
            "ok_length": okl, "ok_distinct": okd, "ok_run": okr,
            "ok_dup": okg, "keep": okl and okd and okr and okg}
