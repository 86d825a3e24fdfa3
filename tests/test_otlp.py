"""OTLP/JSON logs codec (operators/otlp.py): proto3 canonical-JSON
quirks, the era-correct field names, and serialize∘parse identity.

The tree shape mirrors what the reference's pdata marshals
(receiver/splunkhecreceiver/splunk_to_logdata.go:35-56)."""

import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.otlp import (
    parse_otlp_logs, serialize_otlp_logs)

from conftest import rows


def _flat(spark):
    data = [
        ("svc-a", 1_700_000_000_000_000_000, 9, "INFO", "hello",
         {"uid": 42}, {"score": 0.25}, "ab" * 16, "cd" * 8),
        ("svc-a", 1_700_000_001_000_000_000, 17, "ERROR", 'q"uote',
         {"uid": -7}, {"score": -1.5}, "ef" * 16, "01" * 8),
        ("svc-b", 1_700_000_002_000_000_000, 5, "DEBUG", "",
         {"uid": 2**62}, {"score": 1e-9}, "99" * 16, "aa" * 8),
    ]
    return spark.createDataFrame(
        data, "service string, ts_unix_nano long, severity_number int, "
              "severity_text string, body string, "
              "int_attrs map<string,long>, dbl_attrs map<string,double>, "
              "trace_id string, span_id string")


def test_proto3_json_mapping_rules(spark):
    req = serialize_otlp_logs(_flat(spark)).collect()
    by_res = {r["resource"]: json.loads(r["request"]) for r in req}
    assert set(by_res) == {"svc-a", "svc-b"}
    doc = by_res["svc-b"]
    # era-correct names: instrumentationLibraryLogs, not scopeLogs
    rl = doc["resourceLogs"][0]
    ill = rl["instrumentationLibraryLogs"][0]
    assert ill["instrumentationLibrary"]["name"] == \
        "opentelemetry_collector_contrib_spark"
    rec = ill["logRecords"][0]
    # proto3: int64 fields are JSON strings
    assert rec["timeUnixNano"] == "1700000002000000000"
    attr = {a["key"]: a["value"] for a in rec["attributes"]}
    assert attr["uid"] == {"intValue": str(2**62)}
    # AnyValue oneof: exactly one arm set
    assert set(attr["score"]) == {"doubleValue"}
    # resource attribute carries the service name
    res_attr = {a["key"]: a["value"] for a in rl["resource"]["attributes"]}
    assert res_attr["service.name"] == {"stringValue": "svc-b"}
    # severityNumber is a plain JSON int (int32 field)
    assert rec["severityNumber"] == 5


def test_serialize_parse_identity(spark):
    flat = _flat(spark)
    back = parse_otlp_logs(serialize_otlp_logs(flat))
    got = rows(back.select(
        F.element_at("resource_attrs", "service.name").alias("service"),
        "ts_unix_nano", "severity_number", "severity_text", "body",
        F.element_at("attrs", "uid").cast("long").alias("uid"),
        F.element_at("attrs", "score").cast("double").alias("score"),
        "trace_id", "span_id"))
    want = rows(flat.select(
        "service", "ts_unix_nano", "severity_number", "severity_text",
        "body", F.element_at("int_attrs", "uid").alias("uid"),
        F.element_at("dbl_attrs", "score").alias("score"),
        "trace_id", "span_id"))
    assert got == want


def test_parse_is_pure_codegen(spark):
    """Receiver side: no Python eval nodes, no exchange — explicit-
    schema from_json + explodes only."""
    req = serialize_otlp_logs(_flat(spark))
    plan = parse_otlp_logs(req)._jdf.queryExecution().executedPlan().toString()
    after_agg = plan.split("HashAggregate")[0]   # above the serialize agg
    assert "EvalPython" not in after_agg
    assert "Exchange" not in after_agg


def test_metrics_parse_histogram_arm(spark):
    """Hand-built v0.5 request: doubleHistogram datapoints surface with
    int64-as-string bucketCounts and double explicitBounds."""
    import json as _json
    from opentelemetry_collector_contrib_spark.operators.otlp import (
        parse_otlp_metrics)
    req = _json.dumps({"resourceMetrics": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "svc"}}],
            "droppedAttributesCount": 0},
        "instrumentationLibraryMetrics": [{
            "instrumentationLibrary": {"name": "lib", "version": "1"},
            "metrics": [{
                "name": "lat", "description": "", "unit": "ms",
                "doubleHistogram": {
                    "aggregationTemporality":
                        "AGGREGATION_TEMPORALITY_DELTA",
                    "dataPoints": [{
                        "labels": [{"key": "h", "value": "a"}],
                        "timeUnixNano": "1700000000000000000",
                        "count": "7", "sum": 12.5,
                        "bucketCounts": ["1", "2", "4"],
                        "explicitBounds": [5.0, 25.0]}]}}]}]}]})
    df = spark.createDataFrame([(req,)], "request string")
    (row,) = parse_otlp_metrics(df).collect()
    assert row["mtype"] == "double_histogram"
    assert row["hist_count"] == 7 and row["hist_sum"] == 12.5
    assert row["bucket_counts_s"] == "1,2,4"
    assert row["bounds_s"] == "5.0,25.0"
    assert row["temporality"] == "AGGREGATION_TEMPORALITY_DELTA"
    assert row["labels"]["h"] == "a"


def test_metrics_roundtrip_identity(spark):
    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.operators.otlp import (
        parse_otlp_metrics, serialize_otlp_metrics)
    flat = spark.createDataFrame(
        [("s1", "m.g", "1", "double_gauge", {"l": "x"},
          1_700_000_000_000_000_000, 0.5, None),
         ("s1", "m.c", "{n}", "int_sum", {"l": "y"},
          1_700_000_000_000_000_001, None, 2**61),
         ("s2", "m.g", "1", "double_gauge", {"l": "z"},
          1_700_000_000_000_000_002, -1.25, None)],
        "service string, name string, unit string, mtype string, "
        "labels map<string,string>, ts_unix_nano long, value_d double, "
        "value_i long")
    back = parse_otlp_metrics(serialize_otlp_metrics(flat))
    got = sorted(
        (r["ts_unix_nano"], r["mtype"], r["value_d"], r["value_i"],
         r["labels"]["l"], r["temporality"])
        for r in back.collect())
    assert got == [
        (1_700_000_000_000_000_000, "double_gauge", 0.5, None, "x", None),
        (1_700_000_000_000_000_001, "int_sum", None, 2**61, "y",
         "AGGREGATION_TEMPORALITY_CUMULATIVE"),
        (1_700_000_000_000_000_002, "double_gauge", -1.25, None, "z",
         None)]
