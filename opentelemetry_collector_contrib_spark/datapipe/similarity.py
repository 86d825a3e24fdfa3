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
                     F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6)
                     .alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (pairs.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def _plane_sign(vec: Column, dim: int, plane: int, table: int) -> Column:
    """Deterministic pseudo-random hyperplane: coefficient for dimension
    d of plane p is centered-uniform from the portable hash family."""
    from .hashing import portable_hash
    coeffs = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: (F.pmod(
            F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(table), F.lit(plane),
                                  d.cast("string"))), 1, 8), 16, 10)
            .cast("long"), F.lit(2001)) - 1000) / 1000.0)
    return (dot_expr(vec, coeffs) > 0).cast("int")


def lsh_buckets(df: DataFrame, dim: int, n_planes: int = 8,
                n_tables: int = 2, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Assign each vector its LSH bucket signature per table."""
    out = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    tables = []
    for t in range(n_tables):
        bits = [ _plane_sign(F.col("v"), dim, p, t) for p in range(n_planes) ]
        sig = F.concat_ws("", *[b.cast("string") for b in bits])
        tables.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return (out.select("id", "v", F.explode(F.array(*tables)).alias("tb"))
            .select("id", "v", F.col("tb.table").alias("table"),
                    F.col("tb.bucket").alias("bucket")))


def lsh_topk(df: DataFrame, dim: int, k: int = 5, n_planes: int = 8,
             n_tables: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only bucket-sharing candidates."""
    b = lsh_buckets(df, dim, n_planes, n_tables, id_col, vec_col)
    l, r = b.alias("l"), b.alias("r")
    cand = (l.join(r, (F.col("l.table") == F.col("r.table"))
                   & (F.col("l.bucket") == F.col("r.bucket"))
                   & (F.col("l.id") != F.col("r.id")))
            .select(F.col("l.id").alias("query_id"),
                    F.col("r.id").alias("neighbor_id"),
                    F.col("l.v").alias("qv"), F.col("r.v").alias("nv"))
            .dropDuplicates(["query_id", "neighbor_id"]))
    scored = cand.select(
        "query_id", "neighbor_id",
        F.round(cosine_expr(F.col("qv"), F.col("nv")), 6).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
