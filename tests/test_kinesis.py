"""kinesis exporter analog (exporter/kinesisexporter/exporter.go:51-72
+ KPL batching semantics, config.go:31-55)."""

from opentelemetry_collector_contrib_spark.sinks.kinesis import (
    kinesis_batches)
from tests.test_jaeger import _row, _SCHEMA


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SCHEMA)
    return [r.asDict() for r in kinesis_batches(df, **kw).collect()]


def test_same_trace_same_shard_and_oversize_drop(spark):
    tid_a, tid_b = "a" * 32, "b" * 32
    rows = [
        _row(trace_id=tid_a, span_id="%016x" % i, start_ns=10 ** 18 + i)
        for i in range(1, 5)
    ] + [
        _row(trace_id=tid_b, span_id="%016x" % 99),
        # an over-sized span (huge op name) must be quarantined
        _row(trace_id=tid_b, span_id="%016x" % 100, name="x" * 500),
    ]
    out = _run(spark, rows, num_shards=4, max_bytes_per_span=400,
               max_bytes_per_batch=10 ** 6)
    assert sum(r["n_spans"] for r in out) == 5        # 6 in, 1 dropped
    # all 4 spans of trace A land in ONE (shard, batch) row
    assert max(r["n_spans"] for r in out) == 4
    assert len(out) == 2                              # one row per trace


def test_byte_offset_batching_splits_on_capacity(spark):
    tid = "c" * 32
    rows = [_row(trace_id=tid, span_id="%016x" % i,
                 start_ns=10 ** 18 + i) for i in range(1, 9)]
    one = _run(spark, rows, num_shards=1, max_bytes_per_span=10 ** 6,
               max_bytes_per_batch=10 ** 9)
    assert len(one) == 1 and one[0]["n_spans"] == 8
    per_span = one[0]["batch_bytes"] // 8
    # capacity 3p+1: offsets 0..7p -> batches floor(i*p/(3p+1)) =
    # [0,0,0,0,1,1,1,2] (the boundary span overhangs by one — the
    # documented deviation from greedy flush-on-overflow)
    split = _run(spark, rows, num_shards=1, max_bytes_per_span=10 ** 6,
                 max_bytes_per_batch=per_span * 3 + 1)
    split.sort(key=lambda r: r["batch"])
    assert [r["n_spans"] for r in split] == [4, 3, 1]
    assert [r["batch"] for r in split] == [0, 1, 2]
    # batches partition the span sequence in (start_us, span_id) order
    assert split[0]["last_span"] < split[1]["first_span"]
    assert split[1]["last_span"] < split[2]["first_span"]
