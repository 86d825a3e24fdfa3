"""fastText-style hashed-ngram quality classifier tests."""

from __future__ import annotations

from opentelemetry_collector_contrib_spark.datapipe.quality_clf import (
    N_BUCKETS, bucket, grams_py, logit_py, quality_scores, sigmoid, weight)


def test_grams_order_and_counts():
    assert grams_py(["a", "b", "c"]) == ["a", "b", "c", "a b", "b c"]
    assert grams_py(["a"]) == ["a"]
    assert grams_py([]) == []


def test_weights_bounded_and_deterministic():
    ws = [weight(j) for j in range(100)]
    assert all(-1.0 <= w <= 1.0 for w in ws)
    assert ws == [weight(j) for j in range(100)]
    assert 0 <= bucket("hello world") < N_BUCKETS


def test_spark_matches_python_twin(spark):
    texts = ["The quick brown fox", "hello", "", None,
             "a a a a a b b b", "Punct! and; numbers 123"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in quality_scores(df).collect()}
    for i, t in enumerate(texts):
        n, lg = logit_py(t)
        assert got[i]["n_grams"] == n
        assert abs(got[i]["logit"] - round(lg, 6)) < 1e-12
        assert got[i]["label"] == (lg > 0)


def test_sigmoid_monotone_in_logit():
    assert sigmoid(0.0) == 0.5
    assert sigmoid(2.0) > sigmoid(1.0) > sigmoid(0.0) > sigmoid(-1.0)
