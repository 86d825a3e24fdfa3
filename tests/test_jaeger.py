"""jaeger-family exporter analogs vs reference test vectors
(exporter/jaegerthrifthttpexporter/protospan_to_jaegerthrift_test.go)."""

from opentelemetry_collector_contrib_spark.sinks.jaeger import (
    jaeger_spans, logzio_spans, sapm_batches)

_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, "
    "kind string, start_ns long, end_ns long, status_code int, "
    "status_message string, attrs_s map<string,string>, "
    "attrs_i map<string,long>, attrs_b map<string,boolean>, "
    "attrs_d map<string,double>, "
    "links array<struct<trace_id:string,span_id:string,link_type:string>>, "
    "events array<struct<time_ns:long,desc:string,"
    "eattrs:map<string,string>,is_msg:boolean,msg_id:long,msg_type:string,"
    "comp:long,uncomp:long>>, "
    "node_nil boolean, service string, hostname string, pid long, "
    "start_sec long, start_nanos long, node_attrs map<string,string>, "
    "language string, exporter_version string, core_lib_version string, "
    "resource_type string, resource_labels map<string,string>, token string")

_DEFAULTS = dict(
    trace_id="0" * 16 + "52969a8955571a3f", span_id="0000000000647d98",
    parent_span_id="000000000068c4e3", name="get", kind="client",
    start_ns=1485467191639875000, end_ns=1485467191662813000,
    status_code=None, status_message="", attrs_s=None, attrs_i=None,
    attrs_b=None, attrs_d=None, links=None, events=None,
    node_nil=False, service="api", hostname="", pid=0, start_sec=0,
    start_nanos=0, node_attrs=None, language="", exporter_version="",
    core_lib_version="", resource_type="", resource_labels=None,
    token=None)


def _row(**kw):
    d = dict(_DEFAULTS)
    d.update(kw)
    return tuple(d[k] for k in (
        "trace_id span_id parent_span_id name kind start_ns end_ns "
        "status_code status_message attrs_s attrs_i attrs_b attrs_d links "
        "events node_nil service hostname pid start_sec start_nanos "
        "node_attrs language exporter_version core_lib_version "
        "resource_type resource_labels token").split())


def _run(spark, rows, fn=jaeger_spans):
    df = spark.createDataFrame(rows, _SCHEMA)
    return [r.asDict() for r in fn(df).collect()]


def test_reference_vector_ids_times_and_kind_suppression(spark):
    # tds[0].Spans[0] (:410-447): client span whose attrs already carry
    # span.kind, so no extra kind tag is appended
    out = _run(spark, [
        _row(attrs_s={"span.kind": "client"},
             attrs_i={"peer.port": 53931}, attrs_b={"someBool": True},
             attrs_d={"someDouble": 129.8}),
        _row(trace_id="f" * 32, span_id="f" * 16, parent_span_id=None,
             name=None, kind="unspecified"),
    ])
    a = {r["span_id_s"]: r for r in out}
    ref = a[6585752]
    assert (ref["trace_hi"], ref["trace_lo"]) == (0, 5951113872249657919)
    assert ref["parent_id_s"] == 6866147
    assert ref["start_us"] == 1485467191639875
    assert ref["duration_us"] == 22938
    assert ref["tags_s"] == ("peer.port=LONG:53931|someBool=BOOL:true|"
                             "someDouble=DOUBLE:129.8|"
                             "span.kind=STRING:client")
    neg = a[-1]
    assert (neg["trace_hi"], neg["trace_lo"]) == (-1, -1)
    assert neg["parent_id_s"] == 0 and neg["op_name"] == ""
    assert neg["tags_s"] == ""          # unspecified kind: no kind tag


def test_status_tags_and_suppression(spark):
    out = _run(spark, [
        _row(span_id="0000000000000001", kind="server",
             status_code=0, status_message=""),
        _row(span_id="0000000000000002", kind="server",
             status_code=2, status_message="boom"),
        _row(span_id="0000000000000003", kind="server",
             status_code=2, status_message="boom",
             attrs_i={"status.code": 7}),
    ])
    a = {r["span_id_s"]: r["tags_s"] for r in out}
    assert a[1] == "span.kind=STRING:server|status.code=LONG:0"
    assert a[2] == ("span.kind=STRING:server|status.code=LONG:2|"
                    "status.message=STRING:boom")
    # :222-226 — any status.* attr key suppresses BOTH status tags
    assert a[3] == "span.kind=STRING:server|status.code=LONG:7"


def test_zero_ids_quarantined_and_zero_parent_ok(spark):
    out = _run(spark, [
        _row(trace_id="0" * 32, span_id="0000000000000001"),
        _row(span_id="0" * 16),
        _row(span_id="0000000000000002", parent_span_id="0" * 16),
    ])
    assert [r["span_id_s"] for r in out] == [2]
    assert out[0]["parent_id_s"] == 0


def test_refs_and_logs(spark):
    # tds[1].Spans[1] links: PARENT_LINKED_SPAN → CHILD_OF, default →
    # FOLLOWS_FROM, zero link ids are legal (:233-271)
    out = _run(spark, [
        _row(span_id="0000000000000001", links=[
            ("0" * 16 + "52969a8955571a3f", "0000000000647d98", "parent"),
            ("0" * 32, "0" * 16, ""),
        ]),
        _row(span_id="0000000000000002", events=[
            (1485467191639874000, None, None, True, 0, "SENT", 512, 1024),
            (1485467191639875000, "", {"key1": "value1"}, False,
             None, None, 0, 0),
            (1485467191639875000, "annotation description",
             {"event": "nothing"}, False, None, None, 0, 0),
            (1485467191639876000, None, None, True, 7, "RECEIVED", 0, 0),
        ]),
    ])
    a = {r["span_id_s"]: r for r in out}
    assert a[1]["refs_s"] == ("0,5951113872249657919,6585752,CHILD_OF;"
                              "0,0,0,FOLLOWS_FROM")
    assert a[2]["logs_s"] == (
        "1485467191639874@message.id=LONG:0,message.type=STRING:SENT,"
        "message.compressed_size=LONG:512,"
        "message.uncompressed_size=LONG:1024;"
        "1485467191639875@key1=STRING:value1;"
        "1485467191639875@event=STRING:nothing,"
        "description=STRING:annotation description;"
        "1485467191639876@message.id=LONG:7,message.type=STRING:RECEIVED")


def test_process_variants(spark):
    out = _run(spark, [
        # tds[0] node: api246-sjc1 / pid 13 / start 1485467190.639875
        _row(span_id="0000000000000001", hostname="api246-sjc1", pid=13,
             start_sec=1485467190, start_nanos=639875000,
             exporter_version="someVersion",
             resource_type="k8s.io/container",
             resource_labels={"resource_key1": "resource_val1"}),
        # nil node → unknown-service-name, resource IGNORED (:50-53)
        _row(span_id="0000000000000002", node_nil=True,
             resource_type="k8s.io/container"),
        # empty service + zero tags → nil process (:156-159)
        _row(span_id="0000000000000003", service=""),
    ], fn=logzio_spans)
    a = {r["span_id_s"]: r for r in out}
    assert a[1]["proc_service_name"] == "api"
    assert a[1]["proc_s"] == (
        "hostname=STRING:api246-sjc1|"
        "opencensus.exporterversion=STRING:someVersion|"
        "opencensus.resourcetype=STRING:k8s.io/container|pid=LONG:13|"
        "resource_key1=STRING:resource_val1|"
        "start.time=STRING:2017-01-26T21:46:30.639875Z")
    assert a[2]["proc_service_name"] == "unknown-service-name"
    assert a[2]["proc_s"] == ""
    assert a[3]["proc_service_name"] is None and a[3]["proc_s"] is None


def test_sapm_token_grouping_and_strip(spark):
    tok = "com.splunk.signalfx.access_token"
    rows = [
        _row(span_id="0000000000000001", hostname="h",
             resource_labels={tok: "t1"}, token="t1"),
        _row(span_id="0000000000000002", hostname="h",
             resource_labels={tok: "t1"}, token="t1"),
        _row(span_id="0000000000000003", hostname="h",
             resource_labels={tok: "t2"}, token="t2"),
        _row(span_id="0000000000000004", hostname="h"),
    ]
    df_rows = _run(spark, rows, fn=sapm_batches)
    got = {(r["access_token"], r["proc_tags"]): r["n_spans"]
           for r in df_rows}
    assert got == {("t1", "hostname=STRING:h"): 2,
                   ("t2", "hostname=STRING:h"): 1,
                   ("", "hostname=STRING:h"): 1}
