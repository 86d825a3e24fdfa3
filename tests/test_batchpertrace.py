"""batchpertrace Split analog — mirrors batchpertrace_test.go.

Reference: /root/reference/pkg/batchpertrace/batchpertrace_test.go
(TestSplitDifferentTracesIntoDifferentBatches) plus the grouping rules
in batchpertrace.go:21-65 (per-rs/ils maps, first-appearance order,
resource+library copied per batch).
"""

from opentelemetry_collector_contrib_spark.operators.batchpertrace import (
    batch_counts, split_per_trace)

_SCHEMA = ("service string, lib_name string, trace_id string, "
           "span_name string, span_seq int")


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SCHEMA)
    out = split_per_trace(df, resource_cols=["service"],
                          lib_cols=["lib_name"])
    return [r.asDict() for r in
            out.orderBy("service", "lib_name", "batch_seq",
                        "span_seq").collect()]


def test_split_different_traces_into_different_batches(spark):
    # batchpertrace_test.go: 1 rs, 1 ils, two traceIDs -> two batches,
    # in first-appearance order, library copied onto both
    rows = [
        ("svc", "first-library", "t-0102", "first-batch-first-span", 0),
        ("svc", "first-library", "t-0203", "second-batch-span", 1),
        ("svc", "first-library", "t-0102", "first-batch-second-span", 2),
    ]
    got = _run(spark, rows)
    by_batch = {}
    for r in got:
        by_batch.setdefault(r["batch_seq"], []).append(r)
    assert set(by_batch) == {1, 2}
    assert [r["span_name"] for r in by_batch[1]] == \
        ["first-batch-first-span", "first-batch-second-span"]
    assert [r["span_name"] for r in by_batch[2]] == ["second-batch-span"]
    # resource + library metadata present on every row of every batch
    assert all(r["lib_name"] == "first-library" for r in got)
    assert all(r["batch_id"] == f"svc/first-library/{r['trace_id']}"
               for r in got)


def test_same_trace_in_different_ils_splits(spark):
    # batchpertrace.go:29-31: the per-traceID map is scoped PER ILS —
    # the same traceID under two libraries means two batches
    rows = [
        ("svc", "lib-a", "T", "a1", 0),
        ("svc", "lib-b", "T", "b1", 1),
    ]
    out = split_per_trace(
        spark.createDataFrame(rows, _SCHEMA),
        resource_cols=["service"], lib_cols=["lib_name"])
    ids = {r["batch_id"] for r in out.collect()}
    assert ids == {"svc/lib-a/T", "svc/lib-b/T"}
    n = batch_counts(spark.createDataFrame(rows, _SCHEMA),
                     resource_cols=["service"], lib_cols=["lib_name"])
    assert n.count() == 2


def test_batch_seq_first_appearance_order(spark):
    # trace seen later never steals an earlier batch slot, even when
    # its id sorts first lexically
    rows = [
        ("svc", "l", "zz-first-seen", "s0", 0),
        ("svc", "l", "aa-second-seen", "s1", 1),
        ("svc", "l", "zz-first-seen", "s2", 2),
        ("svc", "l", "mm-third-seen", "s3", 3),
    ]
    got = _run(spark, rows)
    seq = {r["trace_id"]: r["batch_seq"] for r in got}
    assert seq == {"zz-first-seen": 1, "aa-second-seen": 2,
                   "mm-third-seen": 3}


def test_split_plan_has_one_exchange(spark):
    # both windows (per-batch min + per-group dense_rank) must ride
    # ONE hash(group) exchange — the subset rule makes the coarse
    # partitioning satisfy the finer (group, trace) clustering
    import re
    rows = [("svc", "l", f"t{i % 3}", f"s{i}", i) for i in range(20)]
    out = split_per_trace(
        spark.createDataFrame(rows, _SCHEMA),
        resource_cols=["service"], lib_cols=["lib_name"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_ex = len(re.findall(
        r"Exchange hashpartitioning|Exchange SinglePartition", plan))
    assert n_ex == 1, plan
