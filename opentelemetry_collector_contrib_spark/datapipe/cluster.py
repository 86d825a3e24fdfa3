"""Duplicate-cluster assembly: connected components over near-dup
pairs.

A real dedup pipeline doesn't stop at pairs — it groups transitively
connected documents into clusters and keeps one survivor per cluster
(pair (A,B) + pair (B,C) must collapse A,B,C together even when (A,C)
was never emitted).  This is min-label propagation expressed as
DataFrame joins:

    label(v) <- min(label(v), min over neighbors u of label(u))

iterated to fixpoint; every node ends with the minimum id of its
component (deterministic cluster ids, any engine agrees).

Scale notes (10^9 docs): each iteration is ONE shuffle keyed by node id
(join edges->labels + min-aggregate); the iteration count is the
component diameter — near-dup clusters are shallow (pairs share a
common template, diameters of 2-4), so 3-6 iterations in practice.
Frames are persisted per iteration and the previous one unpersisted, so
lineage stays O(1) deep.  For adversarial long-chain graphs, the
alternating small-star/large-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond") drops iterations to
O(log d); the propagation loop below is the simple variant that wins
for shallow dedup graphs.

The DuckDB oracle twin is a recursive CTE computing the same min label
over the reachability set (cluster_oracle_sql).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(nodes: DataFrame, pairs: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """nodes: (id), pairs: (id_a, id_b) undirected.  Returns
    (id, cluster_id) where cluster_id = min id of the component
    (singletons keep their own id)."""
    # The edge list is consumed by a join keyed on src EVERY iteration:
    # shuffle it by src ONCE here and persist — the per-iteration join
    # then reuses this partitioning instead of re-exchanging the
    # (largest) side each round.  Serialized storage: edges are
    # long-lived and never row-accessed between joins.
    sym = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
           .unionByName(
               pairs.select(F.col("id_b").alias("src"),
                            F.col("id_a").alias("dst")))
           .repartition(F.col("src"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    # localCheckpoint (not just persist) each iteration: it TRUNCATES
    # the logical plan, keeping analysis cost and plan depth O(1) across
    # iterations — with bare persist the plan nests one join deeper per
    # iteration and Catalyst analysis blows up after ~10 rounds.  On a
    # cluster that cares about executor loss, swap for a reliable
    # checkpoint dir (sc.setCheckpointDir + .checkpoint()).
    labels = nodes.select("id", F.col("id").alias("label")) \
        .localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iter):
        nbr = (sym.join(labels.select(F.col("id").alias("src"),
                                      F.col("label").alias("src_label")),
                        "src")
               .groupBy(F.col("dst").alias("id"))
               .agg(F.min("src_label").alias("nbr_label")))
        # carry the previous label through the checkpoint so convergence
        # is a filter-count over the ALREADY-MATERIALIZED frame — one
        # action per iteration (the eager checkpoint) plus a cheap
        # in-memory scan, instead of a second join of old vs new labels.
        new_labels = (labels.join(nbr, "id", "left")
                      .select("id",
                              F.col("label").alias("_old"),
                              F.least(F.col("label"),
                                      F.coalesce(F.col("nbr_label"),
                                                 F.col("label")))
                              .alias("label"))
                      .localCheckpoint(eager=True))
        changed = new_labels.filter(F.col("label") != F.col("_old")).count()
        labels = new_labels.drop("_old")
        if changed == 0:
            converged = True
            break
    sym.unpersist()
    if not converged:
        # returning silently here would hand back WRONG cluster ids
        # (labels not yet propagated across the component diameter) that
        # downstream survivor selection would trust
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            "iterations — component diameter exceeds max_iter; raise "
            "max_iter (or switch to small-star/large-star for deep graphs)")
    return labels.withColumnRenamed("label", "cluster_id")


def cluster_survivors(docs: DataFrame, clusters: DataFrame,
                      id_col: str = "doc_id") -> DataFrame:
    """One survivor per cluster: the cluster_id row itself (min id) —
    the deterministic keep-first policy applied transitively."""
    return (docs.join(clusters.withColumnRenamed("id", id_col), id_col)
            .filter(F.col(id_col) == F.col("cluster_id")))


def cluster_oracle_sql(nodes_sql: str, pairs_sql: str) -> str:
    """DuckDB twin: recursive min-label reachability.  ``nodes_sql``
    must yield (id), ``pairs_sql`` (id_a, id_b); embed under a
    WITH RECURSIVE prefix."""
    return f"""edges AS (
  SELECT id_a AS a, id_b AS b FROM ({pairs_sql})
  UNION ALL
  SELECT id_b, id_a FROM ({pairs_sql})
), reach(id, label) AS (
    SELECT id, id FROM ({nodes_sql})
  UNION
    SELECT e.b, r.label FROM reach r JOIN edges e ON e.a = r.id
)"""
