"""Weighted reservoir sampling (datapipe/curation.py::weighted_sample):
python-twin parity, determinism, k-overrun, and the statistical bias
toward heavier weights."""

import hashlib
import math

from opentelemetry_collector_contrib_spark.datapipe.curation import (
    weighted_sample)

from conftest import rows


def _twin(items, k):
    """items: (key, text, weight) -> set of selected keys."""
    pri = {}
    for key, text, w in items:
        h = int(hashlib.md5(text.encode()).hexdigest()[:15], 16)
        u = (h + 1.0) / float(1 << 60)
        pri[key] = math.log(u) / float(w)
    top = sorted(pri.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return {key for key, _ in top}


def _df(spark, items):
    return spark.createDataFrame(
        [(key, text, "g", w) for key, text, w in items],
        "doc_id int, text string, lang string, n_chars int")


def test_matches_python_twin(spark):
    items = [(i, f"text body number {i}", 10 + (i % 37)) for i in range(300)]
    got = {r[0] for r in rows(
        weighted_sample(_df(spark, items), "n_chars", 7, "lang"),
        "doc_id")}
    assert got == _twin(items, 7)


def test_deterministic_across_runs(spark):
    items = [(i, f"body {i}", 5 + i % 11) for i in range(100)]
    df = _df(spark, items)
    a = rows(weighted_sample(df, "n_chars", 5, "lang"))
    b = rows(weighted_sample(df, "n_chars", 5, "lang"))
    assert a == b


def test_k_larger_than_group_returns_all(spark):
    items = [(i, f"t{i}", 3) for i in range(4)]
    out = weighted_sample(_df(spark, items), "n_chars", 10, "lang")
    assert out.count() == 4


def test_heavier_weights_win_more_often(spark):
    """1000 independent groups, each with one weight-9 and nine
    weight-1 docs, k=1: the heavy doc should win ~50% of groups
    (9/(9+9·1)), far above the 10% unweighted rate."""
    items = []
    for g in range(1000):
        items.append((g * 10, f"grp{g} heavy", "G%d" % g, 9))
        for j in range(1, 10):
            items.append((g * 10 + j, f"grp{g} light {j}", "G%d" % g, 1))
    df = spark.createDataFrame(
        items, "doc_id int, text string, lang string, n_chars int")
    picked = rows(weighted_sample(df, "n_chars", 1, "lang"), "doc_id")
    heavy_wins = sum(1 for (d,) in picked if d % 10 == 0)
    assert len(picked) == 1000
    assert 0.40 < heavy_wins / 1000 < 0.60     # ±6σ around 0.5
