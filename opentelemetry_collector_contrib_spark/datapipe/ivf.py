"""IVF (inverted-file) approximate nearest neighbor — the second scale
path next to the random-hyperplane LSH in similarity.py.

Classic IVF shape (Jegou et al., "Product Quantization for Nearest
Neighbor Search", §IVFADC without the PQ step):
1. a coarse quantizer of ``n_lists`` centroids partitions the vectors
   into inverted lists (here: a deterministic seeded quantizer derived
   from md5, so Spark and the DuckDB oracle agree bit-for-bit; a
   production deployment would train k-means — e.g. Spark MLlib — and
   broadcast the trained centroids the same way);
2. each query probes its ``nprobe`` nearest lists and scores ONLY the
   vectors in those lists.

Scale notes (10^9+ vectors): the only wide operation is the equi-join
on list_id — shuffle keyed by ~uniform centroid assignment; expected
candidate count is N * nprobe / n_lists per query.  SIZE n_lists to
~sqrt(N) (the classic IVF rule): with too few lists the probe set
approaches brute force — 16 lists over 5k vectors scores 1/8 of all
pairs.  The default 16 matches the sf0.01 oracle (whose SQL inlines
n_lists x dim centroid literals); pass n_lists explicitly for real
corpora.  Assignment is ONE Arrow hop per batch; all distance
arithmetic accumulates left-associatively per dimension so
assignments/probes are IEEE-bit-identical to the oracle's inlined
expressions (ties break to the lowest list index in both engines).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_LISTS = 16
NPROBE = 2


def centroid_coeff(j: int, d: int) -> float:
    """Deterministic centroid coordinate in [-1, 1]: first 8 md5 hex
    digits of "ivf:j:d" (same recipe as similarity.plane_coeff, distinct
    namespace)."""
    h = int(hashlib.md5(f"ivf:{j}:{d}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def centroids(n_lists: int, dim: int):
    import numpy as np
    return np.array([[centroid_coeff(j, d) for d in range(dim)]
                     for j in range(n_lists)])


_ASSIGN_TYPE = T.StructType([
    T.StructField("list_id", T.IntegerType()),
    T.StructField("probes", T.ArrayType(T.IntegerType())),
])


def _assign_udf(n_lists: int, dim: int, nprobe: int, C=None):
    """(list_id, probes): nearest centroid + the nprobe nearest, by
    squared L2, left-assoc per dimension, ties to the lowest index.
    ``C`` (n_lists x dim ndarray) drops in a TRAINED coarse quantizer
    (e.g. `kmeans.kmeans_fit`); default = the seeded oracle-checkable
    centroids.  The array is captured in the UDF closure — Spark
    broadcasts it with the serialized task, the production pattern for
    shipping a trained model to every executor."""
    import numpy as np
    C = centroids(n_lists, dim) if C is None else np.asarray(C, dtype=np.float64)
    n_lists = C.shape[0]

    @F.pandas_udf(_ASSIGN_TYPE)
    def assign(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"list_id": pd.Series([], dtype="int32"),
                                 "probes": pd.Series([], dtype="object")})
        V = np.stack(v.to_numpy()).astype(np.float64)
        dists = np.empty((V.shape[0], n_lists))
        for j in range(n_lists):
            diff0 = V[:, 0] - C[j, 0]
            acc = diff0 * diff0
            for d in range(1, dim):
                diff = V[:, d] - C[j, d]
                acc = acc + diff * diff
            dists[:, j] = acc
        # np.argsort(kind='stable') breaks distance ties by index —
        # matching the oracle's earliest-index-wins CASE chains
        order = np.argsort(dists, axis=1, kind="stable")
        probes = order[:, :nprobe]
        return pd.DataFrame({
            "list_id": probes[:, 0].astype("int32"),
            "probes": [p.astype("int32").tolist() for p in probes]})

    return assign


def ivf_assign(df: DataFrame, dim: int, n_lists: int = N_LISTS,
               nprobe: int = NPROBE, id_col: str = "vec_id",
               vec_col: str = "embedding", centroids_arr=None) -> DataFrame:
    """Add (list_id, probes) to each vector — one Arrow hop.
    ``centroids_arr`` drops in a trained coarse quantizer."""
    a = _assign_udf(n_lists, dim, nprobe, centroids_arr)
    return (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
            .withColumn("_a", a(F.col("v")))
            .select("id", "v", F.col("_a.list_id").alias("list_id"),
                    F.col("_a.probes").alias("probes")))


def ivf_topk(df: DataFrame, dim: int, k: int = 3, n_lists: int = N_LISTS,
             nprobe: int = NPROBE, id_col: str = "vec_id",
             vec_col: str = "embedding", persist: bool = True,
             centroids_arr=None) -> DataFrame:
    """Approximate top-k: each query scores only vectors whose inverted
    list is among its nprobe probes.  Candidate generation joins bare
    ids + list ids; vectors ride only into the scoring step."""
    from .similarity import cosine_batch_udf
    assigned = ivf_assign(df, dim, n_lists, nprobe, id_col, vec_col,
                          centroids_arr)
    if persist:
        assigned = assigned.persist()   # consumed by both join sides
    q = (assigned.select(F.col("id").alias("query_id"),
                         F.col("v").alias("qv"),
                         F.explode("probes").alias("probe")))
    t = assigned.select(F.col("id").alias("neighbor_id"),
                        F.col("v").alias("nv"), "list_id")
    cand = q.join(t, (F.col("probe") == F.col("list_id"))
                  & (F.col("query_id") != F.col("neighbor_id")))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_batch_udf(F.col("qv"), F.col("nv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB)
# ---------------------------------------------------------------------------

def _dist_sql(j: int, dim: int) -> str:
    """Left-assoc squared-L2 to centroid j, (v[i]-c)*(v[i]-c) terms."""
    terms = [f"(v[{d + 1}] - ({centroid_coeff(j, d)!r}))"
             f" * (v[{d + 1}] - ({centroid_coeff(j, d)!r}))"
             for d in range(dim)]
    return " + ".join(terms)


def ivf_assign_sql(dim: int, n_lists: int = N_LISTS) -> str:
    """CTE fragment computing d0..d{n-1} and the earliest-argmin
    list_id for relation ``nv`` (id, v) -> ``ivf_a``."""
    dcols = ", ".join(f"({_dist_sql(j, dim)}) AS d{j}" for j in range(n_lists))
    # earliest index with the global min wins ties (matches stable argsort)
    cases = []
    for j in range(n_lists):
        others = [f"d{i}" for i in range(n_lists) if i != j]
        cases.append(f"WHEN d{j} <= least({', '.join(others)}) THEN {j}")
    argmin = "CASE " + " ".join(cases) + " END"
    return f"""ivf_d AS (
  SELECT id, v, {dcols} FROM nv
), ivf_a AS (
  SELECT *, {argmin} AS list_id FROM ivf_d
)"""


def ivf_probe2_sql(n_lists: int = N_LISTS) -> str:
    """Expression for the SECOND-nearest list over relation ivf_a
    (earliest index among the non-assigned lists with min distance)."""
    cases = []
    for j in range(n_lists):
        others = ", ".join(
            f"CASE WHEN list_id = {i} THEN NULL ELSE d{i} END"
            for i in range(n_lists) if i != j)
        cases.append(
            f"WHEN list_id <> {j} AND d{j} <= least({others}) THEN {j}")
    return "CASE " + " ".join(cases) + " END"
