"""Distributed quantized-Lloyd k-means (datapipe/kmeans.py)."""

import numpy as np

from opentelemetry_collector_contrib_spark.datapipe.kmeans import (
    QSCALE, _quantize, kmeans_fit_assign)


def _vecs(seed=7, n=60, dim=8, k=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim) * 4
    pts = np.concatenate(
        [centers[j] + rng.randn(n // k, dim) * 0.2 for j in range(k)])
    return pts.astype(np.float32)


def _df(spark, pts):
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _numpy_twin(pts, k, iters):
    """Straight-from-the-definition single-machine twin."""
    V = pts.astype(np.float64)
    Vq = _quantize(V) / QSCALE
    Q = _quantize(V)
    cent = Vq[:k].copy()
    assign = None
    for it in range(iters):
        d = ((Vq[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d, axis=1)
        if it == iters - 1:
            break
        for j in range(k):
            m = assign == j
            if m.any():
                cent[j] = Q[m].sum(axis=0).astype(np.float64) / m.sum() \
                    / QSCALE
    return assign


def test_matches_numpy_twin(spark):
    pts = _vecs()
    got = {r["id"]: r["cluster"]
           for r in kmeans_fit_assign(_df(spark, pts), k=3, iters=3)
           .collect()}
    want = _numpy_twin(pts, 3, 3)
    assert [got[i] for i in range(len(pts))] == list(want)


def test_separated_blobs_are_pure_clusters(spark):
    pts = _vecs(n=60, k=3)
    # interleave blobs so the first-k-ids init sees one seed per blob
    # (Lloyd converges to the blob partition from any such init)
    order = np.arange(60).reshape(3, 20).T.reshape(-1)
    pts = pts[order]
    truth = (np.arange(60).reshape(20, 3) % 3).reshape(-1)
    got = kmeans_fit_assign(_df(spark, pts), k=3, iters=3).collect()
    lab = {r["id"]: r["cluster"] for r in got}
    blobs = [set(lab[i] for i in range(60) if truth[i] == j)
             for j in range(3)]
    assert all(len(b) == 1 for b in blobs)
    assert len(set().union(*blobs)) == 3


def test_iteration_is_one_arrow_hop_no_join(spark):
    pts = _vecs()
    out = kmeans_fit_assign(_df(spark, pts), k=3, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Join" not in plan
