"""Product quantization (PQ) — the memory-compression half of IVF-PQ
(Jegou et al., "Product Quantization for Nearest Neighbor Search",
completing the ANN family: brute force -> LSH buckets -> IVF probes ->
PQ codes).

Shape: the vector space is split into ``m`` subspaces; each subspace
has a ``k``-centroid codebook, and a vector is stored as ``m`` small
codes (here 4x2 bits; production uses 8/16 x 8 bits).  Search uses
asymmetric distance computation (ADC): per query, an m x k lookup table
of query-subvector-to-centroid distances is built once, and each
database vector scores as ``sum_m LUT[m][code_m]`` — no float vector is
ever touched again, so a 10^9-vector index fits in RAM.

Like datapipe/ivf.py, the codebooks are deterministic seeded centroids
(md5-derived) so the DuckDB oracle can inline them and agree
bit-for-bit; a production deployment trains per-subspace k-means and
broadcasts the codebooks identically.  Encoding is ONE Arrow hop; all
distance arithmetic accumulates left-associatively per dimension and
across subspaces, ties break to the lowest code index.

Scale notes: encode is embarrassingly parallel; ADC search shuffles
nothing — the query LUTs broadcast (q x m x k doubles) and the code
table scan is narrow.  Storage: m*ceil(log2 k) bits/vector vs 4*dim
bytes raw (here 64-dim float32 = 256 B -> 1 B).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

M_SUB = 4      # subspaces
K_CODES = 4    # centroids per subspace


def pq_coeff(m: int, c: int, d: int) -> float:
    """Deterministic codebook coordinate in [-1, 1] for subspace m,
    centroid c, intra-subspace dim d (same recipe as ivf.centroid_coeff,
    distinct namespace)."""
    h = int(hashlib.md5(f"pq:{m}:{c}:{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def codebooks(dim: int, m: int = M_SUB, k: int = K_CODES):
    import numpy as np
    sub = dim // m
    return np.array([[[pq_coeff(mi, c, d) for d in range(sub)]
                      for c in range(k)] for mi in range(m)])


_ENC_TYPE = T.StructType([
    T.StructField("codes", T.ArrayType(T.IntegerType())),
    T.StructField("recon_err", T.DoubleType()),
])


def _encode_udf(dim: int, m: int, k: int, C=None):
    import numpy as np
    C = codebooks(dim, m, k) if C is None else np.asarray(C, dtype=np.float64)
    sub = dim // m

    @F.pandas_udf(_ENC_TYPE)
    def enc(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"codes": pd.Series([], dtype="object"),
                                 "recon_err": pd.Series([], dtype="f8")})
        V = np.stack(v.to_numpy()).astype(np.float64)
        n = V.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        err = None
        for mi in range(m):
            S = V[:, mi * sub:(mi + 1) * sub]
            dists = np.empty((n, k))
            for c in range(k):
                diff0 = S[:, 0] - C[mi, c, 0]
                acc = diff0 * diff0
                for d in range(1, sub):
                    diff = S[:, d] - C[mi, c, d]
                    acc = acc + diff * diff
                dists[:, c] = acc
            codes[:, mi] = np.argmin(dists, axis=1)  # first min wins
            best = dists[np.arange(n), codes[:, mi]]
            err = best if err is None else err + best
        return pd.DataFrame({"codes": list(codes), "recon_err": err})
    return enc


def pq_encode(df: DataFrame, dim: int, m: int = M_SUB, k: int = K_CODES,
              id_col: str = "vec_id",
              vec_col: str = "embedding", codebooks_arr=None) -> DataFrame:
    """(id, codes array<int>, recon_err): one Arrow hop per batch.
    ``codebooks_arr`` (m x k x dim/m) drops in TRAINED codebooks
    (`train_ivfpq`); default = the seeded oracle-checkable ones."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    enc = _encode_udf(dim, m, k, codebooks_arr)
    return df.select(F.col(id_col).alias("id"),
                     enc(F.col(vec_col).cast("array<double>")).alias("e")) \
             .select("id", F.col("e.codes").alias("codes"),
                     F.col("e.recon_err").alias("recon_err"))


def _adc_udf(dim: int, m: int, k: int, C=None):
    """ADC scorer (qv raw vector, code row) -> distance; left-assoc
    per-dim and per-subspace accumulation, shared by the flat ADC
    search and the IVF-PQ composite so both are bit-identical to the
    oracle's inlined CASE chains."""
    import numpy as np
    C = codebooks(dim, m, k) if C is None else np.asarray(C, dtype=np.float64)
    sub = dim // m

    @F.pandas_udf(T.DoubleType())
    def adc(qv: pd.Series, code: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype="f8")
        Q = np.stack(qv.to_numpy())
        K_ = np.stack(code.to_numpy())
        total = None
        for mi in range(m):
            S = Q[:, mi * sub:(mi + 1) * sub]
            # per-row LUT entry for the row's code (left-assoc dims)
            cc = C[mi][K_[:, mi]]
            diff0 = S[:, 0] - cc[:, 0]
            acc = diff0 * diff0
            for d in range(1, sub):
                diff = S[:, d] - cc[:, d]
                acc = acc + diff * diff
            total = acc if total is None else total + acc
        return pd.Series(total)
    return adc


def pq_adc_topk(df: DataFrame, dim: int, m: int = M_SUB, k: int = K_CODES,
                n_queries: int = 3, topk: int = 3,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """ADC search: the first ``n_queries`` ids (raw vectors) against the
    PQ codes of the whole table.  Query LUTs broadcast; scoring is a
    narrow lookup-sum per (query, code-row) pair."""
    codes = pq_encode(df, dim, m, k, id_col, vec_col)
    queries = (df.where(F.col(id_col) < n_queries)
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv")))
    adc = _adc_udf(dim, m, k)
    # Explicit broadcast: without stats the planner may pick a
    # CartesianProduct (both sides shuffled) for the crossJoin; the
    # query side is n_queries rows by contract, so pin
    # BroadcastNestedLoopJoin — codes never move (plan-pinned in
    # tests/test_plans.py).
    pairs = (F.broadcast(queries).crossJoin(codes)
             .where(F.col("query_id") != F.col("id")))
    scored = pairs.select("query_id", F.col("id").alias("neighbor_id"),
                          F.round(adc(F.col("qv"), F.col("codes")), 6)
                          .alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))


# ---------------------------------------------------------------------------
# DuckDB oracle fragments (codebooks inlined, left-assoc chains)
# ---------------------------------------------------------------------------

def _sub_dist_sql(mi: int, c: int, dim: int, m: int) -> str:
    sub = dim // m
    off = mi * sub
    terms = None
    for d in range(sub):
        co = repr(pq_coeff(mi, c, d))
        t = f"(v[{off + d + 1}] - {co}) * (v[{off + d + 1}] - {co})"
        terms = t if terms is None else f"({terms} + {t})"
    return terms


def pq_encode_sql(dim: int, m: int = M_SUB, k: int = K_CODES) -> str:
    """CTE fragment for relation ``nv`` (id, v) -> ``pq_e`` with code
    columns c0..c{m-1} and recon_err (earliest-argmin, left-assoc)."""
    dcols, ccols, mins = [], [], []
    for mi in range(m):
        for c in range(k):
            dcols.append(f"({_sub_dist_sql(mi, c, dim, m)}) AS q{mi}_{c}")
        others = lambda j: [f"q{mi}_{i}" for i in range(k) if i != j]  # noqa
        cases = " ".join(
            f"WHEN q{mi}_{j} <= least({', '.join(others(j))}) THEN {j}"
            for j in range(k))
        ccols.append(f"(CASE {cases} END) AS c{mi}")
        mins.append(f"least({', '.join(f'q{mi}_{i}' for i in range(k))})")
    err = mins[0]
    for t in mins[1:]:
        err = f"({err} + {t})"
    return f"""pq_d AS (
  SELECT id, v, {', '.join(dcols)} FROM nv
), pq_e AS (
  SELECT id, v, {', '.join(ccols)}, {err} AS recon_err FROM pq_d
)"""


# ---------------------------------------------------------------------------
# IVF-PQ composite (IVFADC, Jegou et al. §IV): coarse lists prune the
# candidate set, ADC over codes scores it — the full billion-vector
# recipe (FAISS IndexIVFPQ shape).
# ---------------------------------------------------------------------------

def ivfpq_index(df: DataFrame, dim: int, m: int = M_SUB, k: int = K_CODES,
                n_lists: int | None = None, nprobe: int | None = None,
                id_col: str = "vec_id",
                vec_col: str = "embedding",
                centroids_arr=None, codebooks_arr=None) -> DataFrame:
    """The coded inverted file: (id, v, list_id, probes, codes).

    One narrow stage, ZERO shuffles: both pandas UDFs (coarse assign,
    PQ encode) evaluate in the same projection over the scan — the
    index build at 10^12 vectors is a single map pass whose output is
    written partitioned by list_id.  Reuses the exact `_assign_udf` /
    `_encode_udf` kernels so assignments and codes stay bit-identical
    to their oracles."""
    from .ivf import _assign_udf, N_LISTS, NPROBE
    n_lists = N_LISTS if n_lists is None else n_lists
    nprobe = NPROBE if nprobe is None else nprobe
    a = _assign_udf(n_lists, dim, nprobe, centroids_arr)
    e = _encode_udf(dim, m, k, codebooks_arr)
    return (df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
            .withColumn("_a", a(F.col("v")))
            .withColumn("_e", e(F.col("v")))
            .select("id", "v",
                    F.col("_a.list_id").alias("list_id"),
                    F.col("_a.probes").alias("probes"),
                    F.col("_e.codes").alias("codes")))


def ivfpq_topk(df: DataFrame, dim: int, m: int = M_SUB, k: int = K_CODES,
               n_lists: int | None = None, nprobe: int | None = None,
               n_queries: int = 3, topk: int = 3,
               id_col: str = "vec_id", vec_col: str = "embedding",
               persist: bool = True,
               centroids_arr=None, codebooks_arr=None) -> DataFrame:
    """IVF-PQ search: each query probes its ``nprobe`` nearest lists
    and ADC-scores ONLY the codes in those lists.

    vs the flat ADC search (`pq_adc_topk`, scans every code) the scan
    shrinks by ~nprobe/n_lists; vs raw IVF (`ivf_topk`, joins float
    vectors) the candidates carry 1-byte-scale codes, never vectors.
    The query side (a handful of rows) is broadcast onto the coded
    lists — BroadcastHashJoin on probe == list_id; the index table
    never moves."""
    index = ivfpq_index(df, dim, m, k, n_lists, nprobe, id_col, vec_col,
                        centroids_arr, codebooks_arr)
    if persist:
        index = index.persist()     # consumed by query + candidate side
    queries = (index.where(F.col("id") < n_queries)
               .select(F.col("id").alias("query_id"),
                       F.col("v").alias("qv"),
                       F.explode("probes").alias("probe")))
    cand = (F.broadcast(queries)
            .join(index.select(F.col("id").alias("neighbor_id"),
                               "list_id", "codes"),
                  F.col("probe") == F.col("list_id"))
            .where(F.col("query_id") != F.col("neighbor_id")))
    adc = _adc_udf(dim, m, k, codebooks_arr)
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(adc(F.col("qv"), F.col("codes")), 6).alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= topk))


def ivfpq_adc_dist_sql(dim: int, m: int = M_SUB, k: int = K_CODES) -> str:
    """ADC distance expression between query relation alias ``q``
    (raw v) and coded relation alias ``t`` (c0..c{m-1}) — the same
    CASE-per-subspace chain as the flat ADC oracle."""
    terms = []
    for mi in range(m):
        cases = " ".join(
            f"WHEN t.c{mi} = {c} THEN ({_sub_dist_sql(mi, c, dim, m)})"
            for c in range(k))
        terms.append(f"(CASE {cases} END)")
    dist = terms[0]
    for t in terms[1:]:
        dist = f"({dist} + {t})"
    return dist.replace("v[", "q.v[")


def _lloyd_np(X, k: int, iters: int, seed: int):
    """Plain numpy Lloyd on a sample: deterministic seeded init (first
    k rows of a seeded permutation), empty clusters re-seeded to the
    farthest point.  Returns (k x dim) centroids."""
    import numpy as np
    rng = np.random.default_rng(seed)
    C = X[rng.permutation(len(X))[:k]].copy()
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for j in range(k):
            mask = a == j
            if mask.any():
                C[j] = X[mask].mean(axis=0)
            else:
                C[j] = X[d.min(axis=1).argmax()]
    return C


def train_ivfpq(df: DataFrame, dim: int, m: int = M_SUB, k: int = K_CODES,
                n_lists: int | None = None, sample_n: int = 65536,
                iters: int = 10, seed: int = 0,
                id_col: str = "vec_id", vec_col: str = "embedding"):
    """Train (coarse centroids, PQ codebooks) on a BOUNDED sample —
    the FAISS pattern: quantizers are fit on O(sample_n) vectors
    driver-side, then broadcast to every executor through the
    ``centroids_arr``/``codebooks_arr`` drop-ins; the full corpus is
    never collected.  The sample is the ``sample_n`` smallest ids
    (deterministic; at production scale feed `dedup.hash_sample`
    output instead).  Driver memory: sample_n x dim doubles.

    For the exact-oracle variant keep the default seeded quantizers;
    trained ones trade bit-checkability for lower quantization error
    (asserted in tests: trained recon_err < seeded recon_err).
    """
    import numpy as np
    from .ivf import N_LISTS
    n_lists = N_LISTS if n_lists is None else n_lists
    rows = (df.select(id_col, vec_col).orderBy(id_col)
            .limit(sample_n).collect())
    X = np.array([list(r[1]) for r in rows], dtype=np.float64)
    cents = _lloyd_np(X, n_lists, iters, seed)
    sub = dim // m
    books = np.stack([
        _lloyd_np(X[:, mi * sub:(mi + 1) * sub], k, iters, seed + 1 + mi)
        for mi in range(m)])
    return cents, books
