"""cumulative_to_delta: Prometheus reset rule vs a python twin."""

from opentelemetry_collector_contrib_spark.operators.metrics_transform import (
    cumulative_to_delta)

from conftest import rows

SAMPLES = [
    # (series, t, id, cum) — reset between t=30 (90) and t=40 (5)
    ("s1", 10, 1, 100), ("s1", 20, 2, 150), ("s1", 30, 3, 90),   # drop: reset
    ("s1", 40, 4, 95),
    ("s2", 10, 5, 7),
]
WANT = {1: None, 2: 50, 3: 90, 4: 5, 5: None}   # reset -> whole new value


def test_reset_rule_matches_expected(spark):
    df = spark.createDataFrame(SAMPLES, "k string, t long, id long, cum long")
    out = cumulative_to_delta(df, ["k"], "t", "cum", tiebreak="id")
    got = {r[0]: r[1] for r in rows(out, "id", "delta")}
    assert got == WANT


def test_non_monotonic_keeps_negative_delta(spark):
    df = spark.createDataFrame(SAMPLES, "k string, t long, id long, cum long")
    out = cumulative_to_delta(df, ["k"], "t", "cum", tiebreak="id",
                              monotonic=False)
    got = {r[0]: r[1] for r in rows(out, "id", "delta")}
    assert got[3] == -60 and got[2] == 50
