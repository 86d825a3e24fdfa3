"""HdrHistogram-style quantile sketch (datapipe/hdrsketch.py):
bucket twin parity, merge law, relative-error guarantee, and the
partial-agg plan shape that makes it an O(buckets)-state groupBy."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.hdrsketch import (
    SUB_BITS, hdr_bucket, hdr_bucket_hi_py, hdr_bucket_py, hdr_build,
    hdr_merge, hdr_quantiles)

VALUES = ([1, 2, 3, 31, 32, 33, 63, 64, 65, 127, 128, 1000, 4096,
           49002, 10**9, 0, -5]
          + [17 * i + 1 for i in range(200)])


def test_bucket_matches_python_twin(spark):
    df = spark.createDataFrame([(v,) for v in VALUES], "v long")
    got = {r.v: r.b for r in
           df.select("v", hdr_bucket(F.col("v")).alias("b")).collect()}
    for v in VALUES:
        assert got[v] == hdr_bucket_py(v), v


def test_bucket_monotone_and_hi_covers_value():
    last = None
    for v in sorted(set(v for v in VALUES if v > 0)):
        b = hdr_bucket_py(v)
        if last is not None:
            assert b >= last
        last = b
        hi = hdr_bucket_hi_py(b)
        assert hi >= v
        # upper edge within the relative-error bound
        assert hi <= v * (1 + 2 ** -SUB_BITS) + 1


def test_bucket_properties_hold_across_int64_range():
    """Property test over the full positive-int64 domain: id is
    monotone non-decreasing, the upper edge covers the value, and the
    relative-error bound holds — the three invariants the quantile
    guarantee rests on."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=1, max_value=(1 << 62) - 1),
           st.integers(min_value=1, max_value=(1 << 62) - 1))
    def check(a, b):
        ba, bb = hdr_bucket_py(a), hdr_bucket_py(b)
        if a <= b:
            assert ba <= bb
        hi = hdr_bucket_hi_py(ba)
        assert hi >= a
        assert hi <= a * (1 + 2 ** -SUB_BITS) + 1

    check()


def test_merge_law_equals_union_build(spark):
    a = spark.createDataFrame(
        [("g", 17 * i % 997 + 1) for i in range(500)], "grp string, v long")
    b = spark.createDataFrame(
        [("g", 29 * i % 4093 + 1) for i in range(500)], "grp string, v long")
    merged = {(r.bucket, r.cnt) for r in
              hdr_merge(hdr_build(a, "v", ["grp"]),
                        hdr_build(b, "v", ["grp"])).collect()}
    union = {(r.bucket, r.cnt) for r in
             hdr_build(a.unionByName(b), "v", ["grp"]).collect()}
    assert merged == union


def test_quantiles_within_relative_error(spark):
    vals = sorted(37 * i % 100003 + 1 for i in range(5000))
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v long")
    sk = hdr_build(df, "v", ["grp"])
    row = hdr_quantiles(sk, [0.5, 0.95, 0.99], ["grp"]).collect()[0]
    assert row["n"] == len(vals)
    # O(buckets) state: far fewer counters than values
    assert row["n_buckets"] < 64 * (math.ceil(math.log2(max(vals))) + 1)
    for q, est in [(0.5, row["p50"]), (0.95, row["p95"]),
                   (0.99, row["p99"])]:
        exact = vals[math.ceil(q * len(vals)) - 1]   # nearest-rank
        assert est >= exact
        assert est <= exact * (1 + 2 ** -SUB_BITS) + 1


def test_build_is_partial_agg_single_exchange(spark):
    df = spark.createDataFrame([("g", 5)], "grp string, v long")
    plan = (hdr_build(df, "v", ["grp"])._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan            # map-side combine
    assert "EvalPython" not in plan           # pure JVM bucket math
