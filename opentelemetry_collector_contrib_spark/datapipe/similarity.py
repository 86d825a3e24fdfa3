"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: exact brute-force top-k per query vector — the
  correctness baseline.  Dot products run JVM-side via zip_with +
  aggregate (codegen, no Python).
- ``lsh_topk``: the scale path — random-hyperplane LSH bucketing; only
  vectors sharing a bucket are scored.  Hyperplanes are derived
  deterministically from the portable hash (seeded), so results are
  reproducible run-to-run (resume-safe), and the recall/cost trade-off
  is (n_planes, n_tables).

Scale notes: brute force is O(N*Q) dot products — fine for broadcast-
sized query sets against 10^9 rows (each partition scores its rows
against the broadcast queries; no shuffle).  Self-join ANN at 10^9+
rows needs the LSH path: the shuffle is keyed by (table, bucket),
bucket sizes are ~N/2^planes, and skewed buckets split under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    """Index-ordered fold — deterministic double-precision sum.  Elements
    cast to double BEFORE the multiply so float32 inputs produce the
    same bits as the (double-arithmetic) oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


import pandas as pd
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def cosine_batch_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine over vector pairs — numpy einsum per batch.
    The Catalyst fold (cosine_expr) is interpreted (higher-order
    functions have no codegen) and ~10x slower; this is the hot-path
    scorer.  Accumulation order differs from the sequential fold by
    ~1e-15 relative, far below the round(6) comparison grain."""
    import numpy as np
    if len(a) == 0:
        return pd.Series([], dtype="float64")
    va = np.stack(a.to_numpy()).astype(np.float64)
    vb = np.stack(b.to_numpy()).astype(np.float64)
    dots = np.einsum("ij,ij->i", va, vb)
    na = np.sqrt(np.einsum("ij,ij->i", va, va))
    nb = np.sqrt(np.einsum("ij,ij->i", vb, vb))
    return pd.Series(dots / (na * nb))


def cosine_topk(df: DataFrame, k: int = 5, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per vector (self-join).  Deterministic
    ranking: rounded cosine desc, then neighbor id asc (stable under
    float noise)."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    a, b = v.alias("a"), v.alias("b")
    pairs = (a.join(b, F.col("a.id") != F.col("b.id"))
             .select(F.col("a.id").alias("query_id"),
                     F.col("b.id").alias("neighbor_id"),
                     F.round(cosine_batch_udf(F.col("a.v"), F.col("b.v")), 6)
                     .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def plane_coeff(table: int, plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient: centered-
    uniform in [-1, 1] from the first 8 md5 hex digits of "t:p:d" —
    reproducible in any engine (the DuckDB oracle inlines the same
    values as literals)."""
    import hashlib
    h = int(hashlib.md5(f"{table}:{plane}:{dim}".encode()).hexdigest()[:8], 16)
    return (h % 2001 - 1000) / 1000.0


def lsh_buckets(df: DataFrame, dim: int, n_planes: int = 8,
                n_tables: int = 2, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Assign each vector its LSH bucket signature per table — ONE Arrow
    hop computing all n_tables x n_planes signs per batch.

    The dot products accumulate LEFT-ASSOCIATIVELY over dimensions
    (vectorized across rows x planes, one fused add per dimension) so
    every sign bit is IEEE-bit-identical to the DuckDB oracle's inlined
    ``v[1]*c0 + v[2]*c1 + ...`` sum — a matmul's pairwise summation
    could flip a bucket bit on a dot product within rounding of zero."""
    import numpy as np
    C = np.array([[[plane_coeff(t, p, d) for d in range(dim)]
                   for p in range(n_planes)] for t in range(n_tables)])

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        V = np.stack(v.to_numpy()).astype(np.float64)
        per_table = []
        for t in range(n_tables):
            acc = V[:, 0:1] * C[t][None, :, 0]      # (rows, planes)
            for d in range(1, dim):
                acc = acc + V[:, d:d + 1] * C[t][None, :, d]
            S = acc > 0
            per_table.append(["".join("1" if b else "0" for b in row)
                              for row in S])
        return pd.Series([list(row) for row in zip(*per_table)])

    out = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    return (out.select("id", "v",
                       F.posexplode(sigs(F.col("v"))).alias("table", "bucket")))


def lsh_topk(df: DataFrame, dim: int, k: int = 5, n_planes: int = 8,
             n_tables: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", persist: bool = True) -> DataFrame:
    """Approximate top-k: score only bucket-sharing candidates.  The
    candidate distinct runs over bare (query_id, neighbor_id) pairs —
    the vectors join back AFTER dedup, so the wide dedup shuffle never
    carries the embedding payloads.  ``persist`` caches the tiny
    (id, table, bucket) frame so the sign UDF doesn't re-run for both
    sides of the self-join."""
    b = (lsh_buckets(df, dim, n_planes, n_tables, id_col, vec_col)
         .drop("v"))
    if persist:
        b = b.persist()
    l, r = b.alias("l"), b.alias("r")
    cand = (l.join(r, (F.col("l.table") == F.col("r.table"))
                   & (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l.id") != F.col("r.id")))
            .select(F.col("l.id").alias("query_id"),
                    F.col("r.id").alias("neighbor_id"))
            .dropDuplicates(["query_id", "neighbor_id"]))
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    cand = (cand
            .join(v.select(F.col("id").alias("query_id"),
                           F.col("v").alias("qv")), "query_id")
            .join(v.select(F.col("id").alias("neighbor_id"),
                           F.col("v").alias("nv")), "neighbor_id"))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_batch_udf(F.col("qv"), F.col("nv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
