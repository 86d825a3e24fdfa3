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


# -- product quantization (datapipe/pq.py) -----------------------------------

def _ivecs(spark, n=120, dim=64, seed=9):
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim)).astype(np.float32)
    rows = [(i, V[i].tolist()) for i in range(n)]
    return (spark.createDataFrame(rows,
                                  "vec_id long, embedding array<float>"),
            V.astype(np.float64))


def test_pq_encode_matches_numpy(spark):
    from opentelemetry_collector_contrib_spark.datapipe.pq import (
        codebooks, pq_encode)
    df, V = _ivecs(spark, n=80)
    got = {r.id: (list(r.codes), r.recon_err)
           for r in pq_encode(df, dim=64).collect()}
    C = codebooks(64)
    for i in range(len(V)):
        codes, err = [], None
        for mi in range(4):
            S = V[i, mi * 16:(mi + 1) * 16]
            dists = [((S - C[mi, c]) ** 2).sum() for c in range(4)]
            c = int(np.argmin(dists))
            codes.append(c)
            err = dists[c] if err is None else err + dists[c]
        gc, ge = got[i]
        assert gc == codes
        assert abs(ge - err) < 1e-9


def test_pq_adc_topk_shape_and_consistency(spark):
    from opentelemetry_collector_contrib_spark.datapipe.pq import pq_adc_topk
    df, _ = _ivecs(spark, n=100)
    out = pq_adc_topk(df, dim=64, n_queries=2, topk=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1}
    for q, rows in by_q.items():
        assert len(rows) == 3
        dists = [r.adc_dist for r in sorted(rows, key=lambda r: r.rank)]
        assert dists == sorted(dists)
        assert all(r.neighbor_id != q for r in rows)


def test_pq_adc_plan_broadcasts_queries(spark):
    """Round-2 verdict item 7: the ADC crossJoin must plan as a
    BroadcastNestedLoopJoin with the (tiny, n_queries-row) query side
    broadcast — never a CartesianProduct, which would shuffle the full
    codes table against it."""
    from opentelemetry_collector_contrib_spark.datapipe.pq import pq_adc_topk
    df, _ = _ivecs(spark, n=50)
    plan = (pq_adc_topk(df, dim=64, n_queries=2, topk=3)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_pq_rejects_bad_dims(spark):
    import pytest
    from opentelemetry_collector_contrib_spark.datapipe.pq import pq_encode
    df, _ = _ivecs(spark, n=5)
    with pytest.raises(ValueError):
        pq_encode(df, dim=63)


def test_ivfpq_candidates_subset_and_dists_match_flat_adc(spark):
    """IVF-PQ = flat ADC restricted to probed lists: every returned
    pair's adc_dist equals the flat search's distance for that pair,
    and every neighbor's list is among the query's probes."""
    from opentelemetry_collector_contrib_spark.datapipe.ivf import ivf_assign
    from opentelemetry_collector_contrib_spark.datapipe.pq import (
        ivfpq_topk, pq_adc_topk)
    df, _ = _ivecs(spark, n=80)
    out = ivfpq_topk(df, dim=64, n_queries=2, topk=3).collect()
    assert {r.query_id for r in out} == {0, 1}
    assigned = {r["id"]: (r["list_id"], r["probes"]) for r in
                ivf_assign(df, dim=64).collect()}
    for r in out:
        probes = assigned[r.query_id][1]
        assert assigned[r.neighbor_id][0] in probes
        assert r.neighbor_id != r.query_id
    # flat ADC distances for the same pairs (rank-free comparison)
    flat = {(r.query_id, r.neighbor_id): r.adc_dist for r in
            pq_adc_topk(df, dim=64, n_queries=2, topk=80).collect()}
    for r in out:
        assert flat[(r.query_id, r.neighbor_id)] == r.adc_dist


def test_ivfpq_plan_broadcasts_queries_no_index_shuffle(spark):
    """The probe join must be a BroadcastHashJoin with the exploded
    query side broadcast — the coded index never exchanges."""
    from opentelemetry_collector_contrib_spark.datapipe.pq import ivfpq_topk
    df, _ = _ivecs(spark, n=50)
    plan = (ivfpq_topk(df, dim=64, n_queries=2, topk=3, persist=False)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    # only exchanges allowed: the broadcast itself + the final top-k
    # window's hash(query_id); the index side must not hash-exchange
    import re
    ex = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert all("query_id" in ln for ln in ex), plan


def test_trained_quantizers_drop_in_and_beat_seeded(spark):
    """The trained-model contract: centroids from the sample trainer
    (or the distributed kmeans_fit) flow through ivf_assign /
    pq_encode / ivfpq_topk unchanged, and trained codebooks fit the
    data strictly better than the seeded stand-ins (lower mean
    reconstruction error)."""
    from opentelemetry_collector_contrib_spark.datapipe.pq import (
        ivfpq_topk, pq_encode, train_ivfpq)
    df, _ = _ivecs(spark, n=120)
    cents, books = train_ivfpq(df, dim=64, sample_n=120, iters=5)
    assert cents.shape == (16, 64) and books.shape == (4, 4, 16)
    seeded = (pq_encode(df, dim=64)
              .agg({"recon_err": "avg"}).collect()[0][0])
    trained = (pq_encode(df, dim=64, codebooks_arr=books)
               .agg({"recon_err": "avg"}).collect()[0][0])
    assert trained < seeded
    out = ivfpq_topk(df, dim=64, n_queries=2, topk=3,
                     centroids_arr=cents, codebooks_arr=books).collect()
    assert {r.query_id for r in out} == {0, 1}
    assert all(r.neighbor_id != r.query_id for r in out)


def test_distributed_kmeans_centroids_drop_into_ivf(spark):
    from opentelemetry_collector_contrib_spark.datapipe.ivf import ivf_assign
    from opentelemetry_collector_contrib_spark.datapipe.kmeans import (
        kmeans_fit)
    df, _ = _ivecs(spark, n=80)
    _, cent = kmeans_fit(df, k=8, iters=2)
    got = ivf_assign(df, dim=64, nprobe=2, centroids_arr=cent).collect()
    assert {r["list_id"] for r in got} <= set(range(8))
    assert all(len(r["probes"]) == 2 for r in got)
