"""IVF ANN: assignment parity vs numpy, probe coverage, and top-k
quality vs the exact brute force."""

import numpy as np

from opentelemetry_collector_contrib_spark.datapipe.ivf import (
    centroids, ivf_assign, ivf_topk)
from opentelemetry_collector_contrib_spark.datapipe.similarity import (
    cosine_topk)


def _vecs(spark, n=60, dim=8, seed=5):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(f"v{i}", V[i].tolist()) for i in range(n)]
    return (spark.createDataFrame(rows, "vec_id string, embedding array<float>"),
            V.astype(np.float64))


def test_ivf_assignment_matches_numpy(spark):
    df, V = _vecs(spark)
    n_lists = 4
    got = {r["id"]: (r["list_id"], r["probes"]) for r in
           ivf_assign(df, dim=8, n_lists=n_lists, nprobe=2).collect()}
    C = centroids(n_lists, 8)
    d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    order = np.argsort(d, axis=1, kind="stable")
    for i in range(len(V)):
        lid, probes = got[f"v{i}"]
        assert lid == order[i, 0]
        assert probes == order[i, :2].tolist()
        assert probes[0] != probes[1]


def test_ivf_topk_subset_of_bruteforce_and_decent_recall(spark):
    df, _ = _vecs(spark)
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(df, k=3).collect()}
    approx = ivf_topk(df, dim=8, k=3, n_lists=4, nprobe=2).collect()
    got = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # every query got some neighbors, and cosines are genuine (appear
    # in the exact pair universe when shared)
    assert len({q for q, _ in got}) == 60
    # probing half the lists (2/4): recall well above chance
    recall = len(got & exact) / len(exact)
    assert recall > 0.4, recall
