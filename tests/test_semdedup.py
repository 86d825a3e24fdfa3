"""SemDeDup semantic dedup: greedy min-id survivor semantics."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.datapipe.semdedup import (
    semantic_dedup)


def test_semdedup_greedy_min_id(spark):
    """Identical vectors collapse to the min id; near-orthogonal ones
    survive; pairs across different clusters are never compared."""
    vecs = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),     # dup of 1 -> dropped
        (3, [0.999, 0.01, 0.0, 0.0]),  # near-dup of 1 -> dropped
        (4, [-1.0, 0.0, 0.0, 0.0]),    # anti-parallel -> kept
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           semantic_dedup(df, dim=4, threshold=0.95, n_lists=2).collect()}
    assert out[1]["kept"] is True          # min id always survives
    assert out[2]["kept"] is False
    # 3 is dropped only if it landed in the same coarse cluster as 1/2;
    # with 2 seeded centroids over near-identical vectors it must.
    assert out[3]["list_id"] == out[1]["list_id"]
    assert out[3]["kept"] is False
    assert out[4]["kept"] is True


def test_semdedup_chain_is_pairwise_not_transitive(spark):
    """a~b and b~c with a!~c: greedy min-id drops BOTH b and c only if
    each is near the min id; here c is near b but not a, so c's verdict
    depends only on smaller ids it is near — b (dropped) still counts
    as a smaller near partner, so c drops too: the greedy rule compares
    against ALL smaller ids, kept or not."""
    import math
    def unit(theta):
        return [math.cos(theta), math.sin(theta), 0.0, 0.0]
    # pairwise cos: a.b = cos(0.2), b.c = cos(0.2), a.c = cos(0.4)
    df = spark.createDataFrame(
        [(1, unit(0.0)), (2, unit(0.2)), (3, unit(0.4))],
        "vec_id long, embedding array<double>")
    # threshold between cos(0.4)~0.921 and cos(0.2)~0.980
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, dim=4, threshold=0.95, n_lists=1).collect()}
    assert out == {1: True, 2: False, 3: False}
