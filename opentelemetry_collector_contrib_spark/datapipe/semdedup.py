"""SemDeDup-style semantic deduplication over an embedding column.

Shape follows Abbas et al., "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication" (arXiv:2303.09540): cluster
the embeddings with a coarse quantizer, then compare pairs ONLY within
a cluster and drop all but one member of every near-identical group.

Spark-first decomposition:
1. coarse assignment reuses :mod:`.ivf`'s deterministic seeded
   quantizer (``ivf_assign``, one Arrow hop; production would broadcast
   trained k-means centroids instead — same plan shape);
2. within-cluster candidate pairs come from a self equi-join on
   ``list_id`` — the ONLY wide exchange, keyed by the ~uniform cluster
   id;
3. survivor policy is the greedy min-id rule: a vector is dropped iff
   some SMALLER id in its cluster has cosine >= threshold.  The minimum
   id of every duplicate group always survives, exactly one pass, no
   iteration.  (This is the pairwise greedy SemDeDup keeps — NOT a
   transitive closure; chains a~b~c where a!~c keep a AND drop b,c.
   For full transitive clusters see datapipe/cluster.py.)

Scale notes (10^9+ vectors): per-cluster pairwise work is
``L * (N/L)^2 = N^2 / L`` — size ``n_lists`` ~ sqrt(N) (the IVF rule)
to bound it at ``N^1.5``, the published SemDeDup cost shape.  Vector
payloads ride into the pair join only as the two operand columns;
everything after the one Arrow cosine hop is codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ivf import N_LISTS, ivf_assign


def semantic_dedup(df: DataFrame, dim: int, threshold: float = 0.3,
                   n_lists: int = N_LISTS, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Per-vector verdict: (vec_id, list_id, kept).

    ``kept`` is false iff a same-cluster vector with a smaller id is
    within ``threshold`` cosine similarity.
    """
    from .similarity import cosine_batch_udf
    assigned = ivf_assign(df, dim, n_lists, nprobe=1,
                          id_col=id_col, vec_col=vec_col).persist()
    left = assigned.select("id", "v", "list_id")
    right = assigned.select(F.col("id").alias("id2"),
                            F.col("v").alias("v2"),
                            F.col("list_id").alias("list_id2"))
    pairs = left.join(
        right, (F.col("list_id") == F.col("list_id2"))
        & (F.col("id2") < F.col("id")))
    dropped = (pairs
               .withColumn("cosine", F.round(
                   cosine_batch_udf(F.col("v"), F.col("v2")), 6))
               .filter(F.col("cosine") >= F.lit(threshold))
               .select("id").distinct())
    return (assigned
            .join(dropped.withColumn("_drop", F.lit(True)), "id", "left")
            .select(F.col("id").alias("vec_id"), "list_id",
                    F.col("_drop").isNull().alias("kept")))
