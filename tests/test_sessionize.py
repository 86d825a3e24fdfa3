"""Gap sessionization vs a pure-Python twin (strict-> gap boundary,
tie-break determinism) and exact-quantile parity vs numpy."""

import numpy as np

from opentelemetry_collector_contrib_spark.operators.sessionize import sessionize

from conftest import rows

EVENTS = [
    # (key, t, id) — gap=100: boundaries at >100 only
    ("u1", 0, 1), ("u1", 100, 2),    # exactly gap -> SAME session
    ("u1", 201, 3),                  # 101 > gap -> new session
    ("u1", 202, 4), ("u1", 500, 5),  # 298 > gap -> new session
    ("u2", 50, 6),
    ("u2", 50, 7),                   # tie: same t, ordered by id
    ("u2", 400, 8),
]


def _twin(gap):
    out = {}
    by_key = {}
    for k, t, i in sorted(EVENTS, key=lambda e: (e[0], e[1], e[2])):
        prev, sess = by_key.get(k, (None, -1))
        if prev is None or t - prev > gap:
            sess += 1
        by_key[k] = (t, sess)
        out[i] = sess
    return out


def test_sessionize_matches_python_twin(spark):
    df = spark.createDataFrame(EVENTS, "k string, t long, id long")
    got = {r[0]: r[1]
           for r in rows(sessionize(df, "k", "t", 100, "id"),
                         "id", "session_no")}
    assert got == _twin(100)


def test_sessionize_single_window_shuffle(spark):
    df = spark.createDataFrame(EVENTS, "k string, t long, id long")
    plan = (sessionize(df, "k", "t", 100, "id")
            ._jdf.queryExecution().executedPlan().toString())
    # lag + running sum share partitioning/ordering -> ONE exchange
    assert plan.count("Exchange hashpartitioning") == 1


def test_exact_percentile_matches_numpy(spark):
    vals = [float(v) for v in (1, 2, 3, 4, 5, 6, 7, 8, 9, 100)]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    got = df.selectExpr(
        "percentile(value, array(0.5D, 0.95D, 0.99D)) AS q").collect()[0]["q"]
    want = np.percentile(vals, [50, 95, 99], method="linear")
    assert np.allclose(got, want)
