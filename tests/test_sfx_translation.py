"""signalfx metric-translation rules (translator.go semantics)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.sfx_translation import (
    SfxRule, dims_signature, translate_datapoints,
)

SCHEMA = ("scrape_id string, metric string, metric_type string, "
          "dims map<string,string>, value_i long, value_d double, ts long")


def _dps(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _collect(df):
    return {(r.metric, tuple(sorted((r.dims or {}).items()))): r
            for r in df.collect()}


def test_rename_and_dimension_ops(spark):
    df = _dps(spark, [
        ("b1", "mem.used", "gauge", {"host": "h1", "iface": "eth0"},
         100, None, 1),
        ("b1", "other", "gauge", {"iface": "eth0"}, 5, None, 1),
    ])
    out = translate_datapoints(df, [
        SfxRule("rename_dimension_keys", mapping={"iface": "interface"},
                metric_names={"mem.used"}),
        SfxRule("rename_metrics", mapping={"mem.used": "memory.usage"},
                add_dimensions={"src": "otel"},
                copy_dimensions={"host": "hostname"}),
    ])
    rows = _collect(out)
    renamed = rows[("memory.usage",
                    (("host", "h1"), ("hostname", "h1"),
                     ("interface", "eth0"), ("src", "otel")))]
    assert renamed.value_i == 100
    # metric_names gate: 'other' keeps its iface key, no rename applied
    assert ("other", (("iface", "eth0"),)) in rows


def test_scaling_and_convert(spark):
    df = _dps(spark, [
        ("b1", "a", "cumulative", {}, 7, None, 1),
        ("b1", "b", "cumulative", {}, 1999, None, 1),
        ("b1", "c", "gauge", {}, None, 2.79, 1),
    ])
    out = translate_datapoints(df, [
        SfxRule("multiply_int", scale_factors_int={"a": 3}),
        SfxRule("divide_int", scale_factors_int={"b": 1000}),
        SfxRule("multiply_float", scale_factors_float={"c": 10.0}),
        SfxRule("convert_values", types_mapping={"c": "int", "a": "double"}),
    ])
    rows = _collect(out)
    assert rows[("b", ())].value_i == 1            # 1999 DIV 1000 truncates
    assert rows[("a", ())].value_d == 21.0         # 7*3 then int->double
    assert rows[("a", ())].value_i is None
    assert rows[("c", ())].value_i == int(2.79 * 10.0)  # truncate, not round
    assert rows[("c", ())].value_d is None


def test_copy_split_drop(spark):
    df = _dps(spark, [
        ("b1", "net.io", "cumulative",
         {"direction": "receive", "host": "h1"}, 10, None, 1),
        ("b1", "net.io", "cumulative",
         {"direction": "transmit", "host": "h1"}, 20, None, 1),
        ("b1", "net.io", "cumulative",
         {"direction": "weird", "host": "h1"}, 30, None, 1),
        ("b1", "junk", "gauge", {}, 1, None, 1),
    ])
    out = translate_datapoints(df, [
        SfxRule("copy_metrics", mapping={"net.io": "net.io.copy"},
                dimension_key="direction", dimension_values={"receive"}),
        SfxRule("split_metric", metric_name="net.io",
                dimension_key="direction",
                mapping={"receive": "net.rx", "transmit": "net.tx"}),
        SfxRule("drop_metrics", metric_names={"junk"}),
    ])
    rows = _collect(out)
    assert rows[("net.rx", (("host", "h1"),))].value_i == 10
    assert rows[("net.tx", (("host", "h1"),))].value_i == 20
    # unmapped dimension value -> datapoint kept as is
    assert ("net.io", (("direction", "weird"), ("host", "h1"))) in rows
    # copy filtered to direction=receive only, copy keeps its dims
    assert rows[("net.io.copy",
                 (("direction", "receive"), ("host", "h1")))].value_i == 10
    assert not any(k[0] == "junk" for k in rows)


def test_aggregate_count_sum_avg(spark):
    rows_in = [
        ("b1", "cores", "gauge", {"cpu": "cpu0", "host": "h1"}, None, 0.22, 1),
        ("b1", "cores", "gauge", {"cpu": "cpu1", "host": "h1"}, None, 0.11, 1),
        ("b1", "cores", "gauge", {"cpu": "cpu0", "host": "h2"}, None, 0.33, 1),
    ]
    # count (the translator.go:78-97 docstring example)
    out = translate_datapoints(_dps(spark, rows_in), [
        SfxRule("aggregate_metric", metric_name="cores",
                aggregation_method="count", without_dimensions=["cpu"])])
    rows = _collect(out)
    assert rows[("cores", (("host", "h1"),))].value_i == 2
    assert rows[("cores", (("host", "h2"),))].value_i == 1
    assert rows[("cores", (("host", "h1"),))].metric_type == "gauge"
    # sum over doubles
    out2 = translate_datapoints(_dps(spark, rows_in), [
        SfxRule("aggregate_metric", metric_name="cores",
                aggregation_method="sum", without_dimensions=["cpu"])])
    assert _collect(out2)[("cores", (("host", "h1"),))].value_d == 0.22 + 0.11
    # avg
    out3 = translate_datapoints(_dps(spark, rows_in), [
        SfxRule("aggregate_metric", metric_name="cores",
                aggregation_method="avg", without_dimensions=["cpu"])])
    assert _collect(out3)[("cores", (("host", "h1"),))].value_d == \
        pytest.approx((0.22 + 0.11) / 2)


def test_calculate_new_metric_and_zero_guard(spark):
    df = _dps(spark, [
        ("b1", "mem.used", "gauge", {"host": "h1"}, 500, None, 1),
        ("b1", "mem.total", "gauge", {"host": "h1"}, 2000, None, 1),
        ("b1", "mem.used", "gauge", {"host": "h2"}, 5, None, 1),
        ("b1", "mem.total", "gauge", {"host": "h2"}, 0, None, 1),   # /0 skip
        ("b2", "mem.used", "gauge", {"host": "h1"}, 7, None, 1),    # no pair
    ])
    out = translate_datapoints(df, [
        SfxRule("calculate_new_metric", metric_name="mem.utilization",
                operand1_metric="mem.used", operand2_metric="mem.total",
                operator="/")])
    util = [r for r in out.collect() if r.metric == "mem.utilization"]
    assert len(util) == 1
    assert util[0].value_d == 500.0 / 2000.0
    assert util[0].dims == {"host": "h1"}


def test_delta_metric_lag(spark):
    df = _dps(spark, [
        ("b1", "reads", "gauge", {"host": "h1"}, 100, None, 10),
        ("b2", "reads", "gauge", {"host": "h1"}, 160, None, 20),
        ("b3", "reads", "gauge", {"host": "h1"}, 190, None, 30),
        ("b1", "reads", "gauge", {"host": "h2"}, 7, None, 10),
    ])
    out = translate_datapoints(df, [
        SfxRule("delta_metric", mapping={"reads": "reads.delta"})])
    deltas = sorted((r.ts, r.value_i) for r in out.collect()
                    if r.metric == "reads.delta")
    assert deltas == [(20, 60), (30, 30)]       # first point emits nothing
    assert all(r.metric_type == "cumulative" for r in out.collect()
               if r.metric == "reads.delta")


def test_validation_errors(spark):
    df = _dps(spark, [("b1", "m", "gauge", {}, 1, None, 1)])
    with pytest.raises(ValueError):
        translate_datapoints(df, [SfxRule("rename_metrics")])
    with pytest.raises(ValueError):
        translate_datapoints(df, [SfxRule("divide_int",
                                          scale_factors_int={"m": 0})])
    with pytest.raises(ValueError):
        translate_datapoints(df, [SfxRule("aggregate_metric",
                                          metric_name="m",
                                          aggregation_method="median",
                                          without_dimensions=["x"])])
    with pytest.raises(ValueError):
        translate_datapoints(df, [SfxRule("nonsense")])


def test_dims_signature_deterministic(spark):
    df = _dps(spark, [("b1", "m", "gauge", {"b": "2", "a": "1"}, 1, None, 1)])
    sig = df.select(dims_signature(F.col("dims")).alias("s")).first().s
    assert sig == "a:1//b:2"


def test_default_rules_cpu_utilization_chain(spark):
    """The signalfx exporter's SHIPPED default-rule sequence for
    cpu.utilization (translation/constants.go:255-315): delta ->
    state-filtered copy -> aggregate -> copy -> aggregate -> divide ->
    split -> x100 -> int convert, run verbatim end to end."""
    states = {"user": [(100.0, 160.0), (50.0, 90.0)],
              "idle": [(200.0, 300.0), (500.0, 560.0)]}
    rows = []
    for state, cpus in states.items():
        for cpu_i, (v1, v2) in enumerate(cpus):
            dims1 = {"host": "h1", "cpu": f"cpu{cpu_i}", "state": state}
            rows.append(("b1", "system.cpu.time", "cumulative", dims1,
                         None, v1, 10))
            rows.append(("b2", "system.cpu.time", "cumulative", dims1,
                         None, v2, 20))
    df = _dps(spark, rows)
    out = translate_datapoints(df, [
        SfxRule("delta_metric", mapping={"system.cpu.time":
                                         "system.cpu.delta"}),
        SfxRule("copy_metrics", mapping={"system.cpu.delta":
                                         "system.cpu.usage"},
                dimension_key="state",
                dimension_values={"interrupt", "nice", "softirq", "steal",
                                  "system", "user", "wait"}),
        SfxRule("aggregate_metric", metric_name="system.cpu.usage",
                aggregation_method="sum",
                without_dimensions=["state", "cpu"]),
        SfxRule("copy_metrics", mapping={"system.cpu.delta":
                                         "system.cpu.total"}),
        SfxRule("aggregate_metric", metric_name="system.cpu.total",
                aggregation_method="sum",
                without_dimensions=["state", "cpu"]),
        SfxRule("calculate_new_metric", metric_name="cpu.utilization",
                operand1_metric="system.cpu.usage",
                operand2_metric="system.cpu.total", operator="/"),
        SfxRule("split_metric", metric_name="system.cpu.time",
                dimension_key="state",
                mapping={"idle": "cpu.idle", "user": "cpu.user"}),
        SfxRule("multiply_float",
                scale_factors_float={"cpu.idle": 100, "cpu.user": 100}),
        SfxRule("convert_values",
                types_mapping={"cpu.idle": "int", "cpu.user": "int"}),
    ])
    rows_out = out.collect()
    util = [r for r in rows_out if r.metric == "cpu.utilization"]
    assert len(util) == 1
    # user deltas 60+40 over total deltas 60+100+40+60
    assert util[0].value_d == (60.0 + 40.0) / (60.0 + 100.0 + 40.0 + 60.0)
    assert util[0].dims == {"host": "h1"}
    # split+scaled+converted per-state cpu metrics (state dim removed)
    cpu_user = sorted(r.value_i for r in rows_out if r.metric == "cpu.user")
    assert cpu_user == sorted(
        [int(100.0 * 100), int(160.0 * 100), int(50.0 * 100),
         int(90.0 * 100)])
    assert all(r.dims.get("state") is None for r in rows_out
               if r.metric in ("cpu.user", "cpu.idle"))
    # the aggregated usage/total intermediates survive with host-only dims
    usage = [r for r in rows_out if r.metric == "system.cpu.usage"]
    assert len(usage) == 1 and usage[0].value_d == 100.0
