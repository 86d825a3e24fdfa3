"""As-of join: cross-checked against pandas merge_asof (independent
twin), inclusive-tie semantics, left-NULL before first version,
tolerance nulling, and the no-cartesian plan shape."""

import pandas as pd

from opentelemetry_collector_contrib_spark.operators.asof import asof_join

from conftest import rows

FACTS = [
    # (key, t, payload)  — includes exact-tie t=100 and pre-dim t=5
    ("a", 5, "f0"), ("a", 100, "f1"), ("a", 150, "f2"), ("a", 250, "f3"),
    ("b", 120, "f4"), ("b", 121, "f5"),
    ("c", 50, "f6"),                      # key with no dim rows at all
]
DIM = [
    # (key, valid_from, tier)
    ("a", 100, "t1"), ("a", 200, "t2"),
    ("b", 1, "t3"),
]


def _twin(tolerance=None):
    f = (pd.DataFrame(FACTS, columns=["k", "t", "p"])
         .sort_values("t").reset_index(drop=True))
    d = (pd.DataFrame(DIM, columns=["k", "vt", "tier"])
         .sort_values("vt").reset_index(drop=True))
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(f, d, left_on="t", right_on="vt", by="k",
                      direction="backward", allow_exact_matches=True, **kw)
    return {(r.k, r.t): (None if pd.isna(r.vt) else int(r.vt),
                         None if pd.isna(r.tier) else r.tier)
            for r in m.itertuples()}


def _run(spark, tolerance_ms=None):
    f = spark.createDataFrame(FACTS, "k string, t long, p string")
    d = spark.createDataFrame(DIM, "k string, vt long, tier string")
    out = asof_join(f, d, on="k", fact_time="t", dim_time="vt",
                    dim_cols=["tier"], tolerance_ms=tolerance_ms)
    return {(r[0], r[1]): (r[2], r[3])
            for r in rows(out, "k", "t", "_asof_time", "tier")}


def test_asof_matches_pandas_merge_asof(spark):
    assert _run(spark) == _twin()


def test_asof_tolerance_matches_pandas(spark):
    # tolerance 60: a@250 matched t2@200 (staleness 50, kept);
    # b@121 matched t3@1 (staleness 120, nulled)
    assert _run(spark, tolerance_ms=60) == _twin(tolerance=60)


def test_asof_plan_has_no_cartesian_or_range_join(spark):
    f = spark.createDataFrame(FACTS, "k string, t long, p string")
    d = spark.createDataFrame(DIM, "k string, vt long, tier string")
    plan = asof_join(f, d, on="k", fact_time="t", dim_time="vt",
                     dim_cols=["tier"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the whole join is union + ONE window (single hash shuffle by key)
    assert plan.count("Window") >= 1
