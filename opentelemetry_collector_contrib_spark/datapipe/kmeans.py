"""Distributed Lloyd k-means over the embeddings table — the corpus
clustering primitive behind SemDeDup-style pipelines and IVF list
training (ivf.py documents trained k-means as its production
quantizer; this module is that trainer, Spark-native).

Classic distributed Lloyd shape, one round per iteration:
1. ASSIGN: nearest centroid per vector — ONE Arrow hop per batch
   (centroids ride in the UDF closure / a broadcast at large k·dim);
   squared-L2 accumulated left-associatively per dimension, ties to
   the lowest centroid index (the ivf.py discipline).
2. UPDATE: per-(cluster, dim) sums + counts — one two-phase
   aggregation whose shuffle carries O(k·dim·partitions) rows, never
   O(rows); the k·dim result is collected to the driver (constant
   size, independent of corpus scale) and becomes the next closure.

Cross-engine float discipline (what makes a 2-iteration Lloyd run
ORACLE-CHECKABLE, which textbook float means are not):
- coordinates are quantized once: q = floor(v · 2^20 + 0.5) as int64
  (floor is exact IEEE, identical in numpy/DuckDB), vq = q / 2^20;
- per-cluster sums are INTEGER sums of q — exact and therefore
  independent of Spark's reduction order, where double sums are not;
- the updated centroid coordinate is CAST(sum AS DOUBLE) / n — one
  correctly-rounded division, bit-identical in both engines;
- empty clusters keep their previous centroid.

A production run at full precision drops the quantization (plain
double means) and loses only the bit-level oracle, not the algorithm.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

QBITS = 20
QSCALE = float(1 << QBITS)


def _quantize(V: np.ndarray) -> np.ndarray:
    return np.floor(V * QSCALE + 0.5).astype(np.int64)


def _assign_udf(cent_vq: np.ndarray):
    k, dim = cent_vq.shape
    C = cent_vq

    @F.pandas_udf(T.IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        V = np.stack(v.to_numpy()).astype(np.float64)
        Vq = _quantize(V) / QSCALE
        dists = np.empty((V.shape[0], k))
        for j in range(k):
            diff0 = Vq[:, 0] - C[j, 0]
            acc = diff0 * diff0
            for d in range(1, dim):
                diff = Vq[:, d] - C[j, d]
                acc = acc + diff * diff
            dists[:, j] = acc
        return pd.Series(np.argmin(dists, axis=1).astype("int32"))
    return assign


def _q_array(vec_col):
    """Catalyst-side exact quantization (same floor rule as the UDF)."""
    return F.transform(vec_col, lambda x: F.floor(
        x.cast("double") * F.lit(QSCALE) + F.lit(0.5)).cast("long"))


def kmeans_fit(df: DataFrame, k: int = 8, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding"):
    """Run the distributed Lloyd loop and return ``(base frame,
    final centroids ndarray)`` — the centroids are the trained
    quantizer to broadcast into `ivf_assign`/`ivfpq_*` via their
    ``centroids_arr`` drop-in.  Init: the vectors of the k smallest
    ids (deterministic, SQL-expressible; swap for k-means|| sampling
    at production scale)."""
    seeds = (df.select(id_col, vec_col).orderBy(id_col).limit(k).collect())
    cent = _quantize(np.array([list(r[1]) for r in seeds],
                              dtype=np.float64)) / QSCALE

    base = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("v"),
                     _q_array(F.col(vec_col)).alias("q"))
    for _ in range(max(iters - 1, 0)):
        assigned = base.withColumn("cluster", _assign_udf(cent)(F.col("v")))
        sums = (assigned
                .select("cluster", F.posexplode("q").alias("d", "qv"))
                .groupBy("cluster", "d")
                .agg(F.sum("qv").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect())
        new = cent.copy()
        per = {}
        for r in sums:
            per.setdefault(r["cluster"], {})[r["d"]] = (r["s"], r["n"])
        for j, dims in per.items():
            for d, (s, n) in dims.items():
                new[j, d] = float(s) / n / QSCALE
        cent = new
    return base, cent


def kmeans_fit_assign(df: DataFrame, k: int = 8, iters: int = 2,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Run ``iters`` Lloyd rounds; return (id, cluster) under the FINAL
    centroids (iters assigns, iters-1 centroid updates — unchanged
    numerics, now via `kmeans_fit`)."""
    base, cent = kmeans_fit(df, k, iters, id_col, vec_col)
    return (base.withColumn("cluster", _assign_udf(cent)(F.col("v")))
            .select("id", "cluster"))


def kmeans_oracle_sql(k: int = 8, iters: int = 2, dim: int = 64,
                      src: str = "embeddings", id_sql: str = "vec_id",
                      vec_sql: str = "embedding") -> str:
    """DuckDB twin: the same quantized-Lloyd rounds unrolled as CTEs.
    Integer sums are exact, so engine reduction order cannot differ.
    ``dim`` must be a build-time constant — DuckDB's generate_series/
    range table functions reject column arguments."""
    assert iters >= 1
    dist = (f"list_reduce(list_transform(range(1, {dim} + 1), "
            "i -> (a.vq[i] - c.vq[i]) * (a.vq[i] - c.vq[i])), "
            "(x, y) -> x + y)")
    parts = [f"""q0 AS (
  SELECT {id_sql} AS id,
         list_transform({vec_sql},
           x -> CAST(floor(CAST(x AS DOUBLE) * {QSCALE!r} + 0.5)
                     AS BIGINT)) AS q,
         len({vec_sql}) AS dim
  FROM {src}
), vq AS (
  SELECT id, dim, list_transform(q, x -> x / {QSCALE!r}) AS vq, q
  FROM q0
), c0 AS (
  SELECT row_number() OVER (ORDER BY id) - 1 AS j, vq
  FROM vq ORDER BY id LIMIT {k}
)"""]
    prev = "c0"
    for it in range(1, iters + 1):
        parts.append(f""", d{it} AS (
  SELECT a.id, a.q, c.j, {dist} AS dist
  FROM vq a CROSS JOIN {prev} c
), a{it} AS (
  SELECT id, q, j AS cluster FROM (
    SELECT id, q, j, row_number() OVER (
      PARTITION BY id ORDER BY dist ASC, j ASC) AS rk
    FROM d{it})
  WHERE rk = 1
)""")
        if it < iters:
            parts.append(f""", s{it} AS (
  SELECT cluster AS j, i AS d, sum(q[i]) AS s, count(*) AS n
  FROM a{it}, generate_series(1, {dim}) AS g(i)
  GROUP BY cluster, i
), c{it} AS (
  SELECT p.j,
         list(CASE WHEN s.s IS NULL THEN p.vq[s2.i]
              ELSE (CAST(s.s AS DOUBLE) / s.n) / {QSCALE!r} END
              ORDER BY s2.i) AS vq
  FROM {prev} p
  CROSS JOIN generate_series(1, {dim}) AS s2(i)
  LEFT JOIN s{it} s ON s.j = p.j AND s.d = s2.i
  GROUP BY p.j
)""")
            prev = f"c{it}"
    parts.append(f"\nSELECT id, CAST(cluster AS INT) AS cluster "
                 f"FROM a{iters}")
    return "".join(parts)
