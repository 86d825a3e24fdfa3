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
