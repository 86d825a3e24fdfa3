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


def test_semdedup_matches_bruteforce_twin(spark):
    """Randomized (seeded) corpus vs a brute-force Python twin of the
    greedy min-id rule: dropped iff a smaller same-cluster id has
    cosine >= threshold."""
    import numpy as np
    from opentelemetry_collector_contrib_spark.datapipe.ivf import centroids

    rng = np.random.default_rng(7)
    dim, n, n_lists, thr = 8, 40, 4, 0.8
    V = rng.normal(size=(n, dim))
    # plant duplicates so the threshold actually fires
    V[7] = V[3] * 1.001
    V[19] = V[11] + rng.normal(scale=1e-3, size=dim)
    C = centroids(n_lists, dim)

    def assign(v):
        d = ((C - v) ** 2).sum(axis=1)
        return int(np.argmin(d))

    lists = [assign(V[i]) for i in range(n)]

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    expect = {}
    for i in range(n):
        dropped = any(lists[j] == lists[i] and cos(V[i], V[j]) >= thr
                      for j in range(i))
        expect[i] = not dropped

    from opentelemetry_collector_contrib_spark.datapipe.semdedup import (
        semantic_dedup)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, dim=dim, threshold=thr,
                          n_lists=n_lists).collect()}
    assert got == expect
    assert not got[7] and not got[19]   # the planted dups were dropped
