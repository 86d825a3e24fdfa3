"""Connected-components dedup clustering: transitivity, singletons,
chain graphs, and survivor selection."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.cluster import (
    cluster_survivors, connected_components)


def _nodes(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "id long")


def _pairs(spark, pairs):
    return spark.createDataFrame(list(pairs), "id_a long, id_b long")


def test_transitive_merge_and_singletons(spark):
    # (1,2)+(2,3) must collapse 1,2,3 though (1,3) was never emitted;
    # 7 is a singleton; (10,11) a separate cluster
    nodes = _nodes(spark, [1, 2, 3, 7, 10, 11])
    pairs = _pairs(spark, [(1, 2), (2, 3), (10, 11)])
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(nodes, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    # worst-case diameter: a 12-node path; propagation must still reach
    # the fixpoint (min id = 0 everywhere)
    n = 12
    nodes = _nodes(spark, range(n))
    pairs = _pairs(spark, [(i, i + 1) for i in range(n - 1)])
    got = {r["id"]: r["cluster_id"]
           for r in connected_components(nodes, pairs).collect()}
    assert all(v == 0 for v in got.values())


def test_cc_edge_cache_partitioning_reused(spark):
    """Plan pin for the iteration loop's cost model: the symmetric edge
    list is shuffled by src ONCE (inside the persisted relation), so
    the per-iteration propagation join consumes the cache scan with NO
    Exchange between them — only the labels side and the groupBy(dst)
    propagation shuffle move per round.  Re-derives the loop's first
    nbr frame white-box (the loop itself doesn't expose per-iteration
    plans)."""
    from pyspark import StorageLevel
    pairs = (spark.range(2000)
             .select(F.col("id").alias("id_a"),
                     (F.col("id") + 1).alias("id_b")))
    sym = (pairs.select(F.col("id_a").alias("src"),
                        F.col("id_b").alias("dst"))
           .unionByName(pairs.select(F.col("id_b").alias("src"),
                                     F.col("id_a").alias("dst")))
           .repartition(F.col("src"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    sym.count()
    labels = (spark.range(2001)
              .select("id", F.col("id").alias("label"))
              .localCheckpoint(eager=True))
    nbr = (sym.join(labels.select(F.col("id").alias("src"),
                                  F.col("label").alias("src_label")), "src")
           .groupBy(F.col("dst").alias("id"))
           .agg(F.min("src_label").alias("nbr_label")))
    nbr.collect()
    plan = nbr._jdf.queryExecution().executedPlan().toString()
    sym.unpersist()
    # the cache scan feeds the join directly: any Exchange between the
    # join and InMemoryTableScan would mean the edge list re-shuffles
    # every iteration
    join_block = plan[plan.index("Join"):plan.index("InMemoryTableScan")]
    assert "Exchange" not in join_block
    # exactly one repartition of the edges exists, inside the cached
    # relation (REPARTITION_BY_COL), paid at persist time
    assert plan.count("REPARTITION_BY_COL") >= 1


def test_cluster_survivors_keep_min_id(spark):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (7, "x")], "doc_id long, text string")
    clusters = connected_components(
        _nodes(spark, [1, 2, 3, 7]), _pairs(spark, [(1, 2), (2, 3)]))
    kept = sorted(r["doc_id"]
                  for r in cluster_survivors(docs, clusters).collect())
    assert kept == [1, 7]
