"""HyperLogLog + count-min sketches (datapipe/sketches.py): register
parity with a pure-Python twin, estimator accuracy bounds, the CMS
overcount-only guarantee, and the plan shapes (partial-agg shuffle,
broadcast probe)."""

import hashlib
import math

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.hashing import (
    MERSENNE_P, _A, _B)
from opentelemetry_collector_contrib_spark.datapipe.sketches import (
    CMS_D, CMS_W, HLL_B, HLL_M, HLL_RMAX, cms_build, cms_query,
    hll_estimate)

from conftest import rows


def _twin_hll(keys):
    regs = {}
    for kk in keys:
        h = int(hashlib.md5(kk.encode()).hexdigest()[:15], 16)
        j, w = h % HLL_M, h >> HLL_B
        rho = HLL_RMAX if w == 0 else HLL_RMAX - w.bit_length()
        regs[j] = max(regs.get(j, 0), rho)
    z = sum(1 << (HLL_RMAX - mj) for mj in regs.values())
    z += (HLL_M - len(regs)) * (1 << HLL_RMAX)
    alpha = 0.7213 / (1 + 1.079 / HLL_M)
    raw = alpha * HLL_M * HLL_M * float(1 << HLL_RMAX) / z
    v = HLL_M - len(regs)
    if raw <= 2.5 * HLL_M and v > 0:
        return round(HLL_M * math.log(HLL_M / v), 6)
    return round(raw, 6)


def _keys(n, tag="k"):
    return [f"{tag}-{i:06d}" for i in range(n)]


def test_hll_matches_python_twin_small_and_large(spark):
    for n in (5, 200, 5000):
        keys = _keys(n)
        df = spark.createDataFrame([(k, "g") for k in keys],
                                   "w string, lang string")
        got = rows(hll_estimate(df, "w", "lang"))
        assert got == [("g", _twin_hll(keys))], f"n={n}"


def test_hll_accuracy_within_bound(spark):
    """Standard error for m=256 is 1.04/sqrt(m) ≈ 6.5%; assert 3σ."""
    n = 20000
    df = spark.createDataFrame([(k, "g") for k in _keys(n)],
                               "w string, lang string")
    est = rows(hll_estimate(df, "w", "lang"))[0][1]
    assert abs(est - n) / n < 3 * 1.04 / math.sqrt(HLL_M)


def test_hll_duplicates_do_not_inflate(spark):
    df = spark.createDataFrame(
        [(f"k-{i % 50:06d}", "g") for i in range(5000)],
        "w string, lang string")
    est = rows(hll_estimate(df, "w", "lang"))[0][1]
    assert est == _twin_hll(_keys(50))


def test_hll_plan_partial_aggregates(spark):
    """Both aggregations must be two-phase: the exchange carries
    register partials, never raw keys."""
    df = spark.createDataFrame([("a", "g")], "w string, lang string")
    plan = (hll_estimate(df, "w", "lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") <= 2
    assert "partial_max" in plan or "partial" in plan


def test_cms_overcount_only_and_exact_when_sparse(spark):
    corpus = spark.createDataFrame(
        [(f"w{i % 10}",) for i in range(1000)], "w string")
    sketch = cms_build(corpus, "w")
    probe = spark.createDataFrame(
        [("w0",), ("w3",), ("missing",)], "w string")
    got = dict(rows(cms_query(sketch, probe, "w")))
    # 10 distinct keys over d=4 rows of w=256 counters: collisions
    # are possible only if two keys share a counter in EVERY row
    assert got["w0"] >= 100 and got["w3"] >= 100
    assert got["missing"] >= 0
    exact = {"w0": 100, "w3": 100, "missing": 0}
    for k, v in got.items():
        assert v >= exact[k]          # the CMS one-sided guarantee


def test_cms_counters_match_python_twin(spark):
    corpus_keys = [f"w{i % 7}" for i in range(700)]
    corpus = spark.createDataFrame([(k,) for k in corpus_keys],
                                   "w string")
    got = {(i, p): c for i, p, c in rows(cms_build(corpus, "w"))}
    twin = {}
    for kk in corpus_keys:
        h = int(hashlib.md5(kk.encode()).hexdigest()[:8], 16)
        for i in range(CMS_D):
            p = (h * _A[i] + _B[i]) % MERSENNE_P % CMS_W
            twin[(i, p)] = twin.get((i, p), 0) + 1
    assert got == twin


def test_hll_merge_equals_union_sketch(spark):
    """The mergeability law: estimate(merge(regs(A), regs(B))) must
    equal estimate(A ∪ B) EXACTLY (same registers -> same integer
    indicator sum -> bit-identical estimate)."""
    from opentelemetry_collector_contrib_spark.datapipe.sketches import (
        hll_estimate_from_registers, hll_merge, hll_registers)
    a = spark.createDataFrame([(k, "g") for k in _keys(800, "a")],
                              "w string, lang string")
    b = spark.createDataFrame(
        [(k, "g") for k in _keys(500, "b") + _keys(100, "a")],
        "w string, lang string")
    merged = hll_merge(hll_registers(a, "w", "lang"),
                       hll_registers(b, "w", "lang"))
    got = rows(hll_estimate_from_registers(merged, "lang"))
    want = rows(hll_estimate(a.unionByName(b), "w", "lang"))
    assert got == want


def test_cms_merge_is_counter_sum(spark):
    from opentelemetry_collector_contrib_spark.datapipe.sketches import (
        cms_merge)
    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 5, "w string")
    b = spark.createDataFrame([("x",)] * 12, "w string")
    merged = cms_merge(cms_build(a, "w"), cms_build(b, "w"))
    probe = spark.createDataFrame([("x",), ("y",)], "w string")
    got = dict(rows(cms_query(merged, probe, "w")))
    whole = dict(rows(cms_query(cms_build(a.unionByName(b), "w"),
                                probe, "w")))
    assert got == whole and got["x"] >= 42 and got["y"] >= 5


def test_cms_probe_is_broadcast_join(spark):
    corpus = spark.createDataFrame([("a",)], "w string")
    sketch = cms_build(corpus, "w")
    probe = spark.createDataFrame([("a",)], "w string")
    plan = (cms_query(sketch, probe, "w")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
