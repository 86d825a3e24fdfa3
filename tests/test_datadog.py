"""datadogexporter analog — hostname chain, naming, error rules."""

from opentelemetry_collector_contrib_spark.sinks.datadog import (
    datadog_spans, datadog_trace_rollup)

_SPANS = ("trace_id string, span_id string, parent_span_id string, "
          "name string, kind string, start_ns long, end_ns long, "
          "status_code int, status_message string, trace_state string, "
          "attrs map<string,string>, resource map<string,string>, "
          "lib_name string, lib_version string")


def _span(sid, kind="server", name="op", code=0, msg="", state="",
          attrs=None, res=None, lib="lib", ver="1", parent="b" * 16,
          start=10**9, end=2 * 10**9, trace="a" * 32):
    return (trace, sid, parent, name, kind, start, end, code, msg, state,
            attrs or {}, res or {}, lib, ver)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, _SPANS)
    return {r["span_id_dec"]: r.asDict()
            for r in datadog_spans(df, **kw).collect()}


def test_hostname_chain_and_aws_quirk(spark):
    got = _run(spark, [
        _span("1" * 16, res={"datadog.host.name": "dd", "host.name": "x"}),
        _span("2" * 16, res={"k8s.node.name": "n", "k8s.cluster.name": "c"}),
        _span("3" * 16, res={"cloud.provider": "aws",
                             "host.name": "ip-1-2-3-4", "host.id": "i-9"}),
        _span("4" * 16, res={"cloud.provider": "aws"}),   # aws direct return
        _span("5" * 16, res={"host.name": "plain"}),
        _span("6" * 16),
    ], cfg_hostname="fallback")
    by_host = {k[:1]: v["hostname"] for k, v in
               {r["span_id_dec"]: r for r in got.values()}.items()}
    hosts = [got[str(int("1" * 16, 16))]["hostname"],
             got[str(int("2" * 16, 16))]["hostname"],
             got[str(int("3" * 16, 16))]["hostname"],
             got[str(int("4" * 16, 16))]["hostname"],
             got[str(int("5" * 16, 16))]["hostname"],
             got[str(int("6" * 16, 16))]["hostname"]]
    assert hosts == ["dd", "n-c", "i-9", "fallback", "plain", "fallback"]


def test_service_name_and_span_naming(spark):
    got = _run(spark, [
        _span("1" * 16, res={"service.name": "rs"}, lib="My-Lib!"),
        _span("2" * 16, res={"service.name": ""}, lib="",
              attrs={"otel.instrumentation_library.name": "Old"}),
        _span("3" * 16, kind="client", lib="",
              attrs={"service.name": "span-svc"}),
    ], cfg_service="cfgsvc")
    one = got[str(int("1" * 16, 16))]
    assert one["service"] == "rs"
    assert one["dd_name"] == "my_lib_.server"      # trace_helpers.go:40-105:
    # "!" -> "_" is not contiguous with "-"->"_" and "." keeps it non-trailing
    two = got[str(int("2" * 16, 16))]
    assert two["service"] == "cfgsvc"              # empty -> cfg
    assert two["dd_name"] == "old.server"          # legacy IL tag
    three = got[str(int("3" * 16, 16))]
    assert three["service"] == "span-svc"          # span attr override
    assert three["dd_name"] == "opentelemetry.client"
    assert three["dd_type"] == "http"


def test_error_rules_and_resource_name(spark):
    got = _run(spark, [
        _span("1" * 16, code=2, msg="bad",
              attrs={"http.method": "GET", "http.route": "/r"}),
        _span("2" * 16, kind="client", attrs={"http.status_code": "418",
                                              "http.method": "POST"}),
        _span("3" * 16, kind="server", attrs={"http.status_code": "418"}),
        _span("4" * 16, attrs={"http.status_code": "503"}),
        _span("5" * 16, attrs={"messaging.operation": "send",
                               "messaging.destination": "q"}),
    ])
    one = got[str(int("1" * 16, 16))]
    assert one["error"] == 1
    assert "error.msg=bad" in one["meta_s"]
    assert "error.type=ERR_CODE_2" in one["meta_s"]
    assert one["resource_name"] == "GET /r"
    assert got[str(int("2" * 16, 16))]["error"] == 1   # client 4xx
    assert got[str(int("3" * 16, 16))]["error"] == 0   # server 4xx ok
    assert got[str(int("4" * 16, 16))]["error"] == 1   # 5xx always
    assert got[str(int("5" * 16, 16))]["resource_name"] == "send q"


def test_ids_container_tags_and_rollup(spark):
    rows = [
        _span("00000000000000aa", parent=None,
              attrs={"analytics.event": "true"},
              res={"container.id": "c1", "k8s.pod.name": "p1"},
              trace="f" * 32, start=5),
        _span("00000000000000ab", parent="0" * 16, trace="f" * 32, start=3,
              res={"container.id": "c1", "k8s.pod.name": "p1"}),
    ]
    df = spark.createDataFrame(rows, _SPANS)
    out = {r["span_id_dec"]: r.asDict() for r in datadog_spans(df).collect()}
    a = out["170"]
    assert a["trace_id_dec"] == str(int("f" * 16, 16))  # low 8 bytes
    assert a["parent_id_dec"] == "0"
    assert a["metrics_s"] == "_dd1.sr.eausr=1.0"
    assert "_dd.tags.container=container_id:c1,pod_name:p1" in a["meta_s"]
    assert out["171"]["parent_id_dec"] == "0"           # zero id invalid
    roll = datadog_trace_rollup(datadog_spans(df)).collect()
    assert len(roll) == 1
    r = roll[0].asDict()
    assert (r["n_spans"], r["trace_start"], r["trace_end"]) == (2, 3, 0)
