"""sentryexporter analog — descriptors, status, and orphan assembly."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sinks.sentry import (
    convert_spans, sentry_transactions)

_SCHEMA = ("trace_id string, span_id string, parent_span_id string, "
           "name string, kind string, start_ns long, end_ns long, "
           "status_code int, status_message string, "
           "attrs map<string,string>")


def _span(tid, sid, parent, name="n", kind=None, code=1, msg="",
          attrs=None, start=0, end=1):
    return (tid, sid, parent, name, kind, start, end, code, msg,
            attrs or {})


def _conv(spark, rows, **kw):
    return convert_spans(spark.createDataFrame(rows, _SCHEMA), **kw)


def test_descriptors_reference_table(spark):
    # mirrors the reference's TestGenerateSpanDescriptors
    # (sentry_exporter_test.go:241-320)
    cases = [
        ({"http.method": "GET"}, "client", "/u", "http.client", "GET /u"),
        ({"http.method": "POST"}, "server", "/u", "http.server", "POST /u"),
        ({"db.system": "redis"}, "client", "SET k", "db", "SET k"),
        ({"db.system": "sqlite", "db.statement": "SELECT * FROM t"},
         "client", "mysql call", "db", "SELECT * FROM t"),
        ({"rpc.service": "Echo"}, "client", "g.Echo/Echo", "rpc",
         "g.Echo/Echo"),
        ({"messaging.system": "kafka"}, "producer", "dest", "message",
         "dest"),
        ({"faas.trigger": "pubsub"}, "server", "dest", "pubsub", "dest"),
        ({}, "internal", "plain", "", "plain"),
    ]
    rows = [_span("t", f"s{i}", "", name=n, kind=k, attrs=a)
            for i, (a, k, n, _, _d) in enumerate(cases)]
    got = {r["span_id"]: (r["op"], r["description"])
           for r in _conv(spark, rows).collect()}
    for i, (_a, _k, _n, op, desc) in enumerate(cases):
        assert got[f"s{i}"] == (op, desc), i


def test_status_and_tags(spark):
    rows = [
        _span("t", "a", "", code=1, msg="fine"),           # ok, msg tagged
        _span("t", "b", "", code=2, msg=""),               # unknown, no tag
        _span("t", "c", "", code=7, msg="ignored"),        # out of range
        _span("t", "d", "", kind="server",
              attrs={"server_name": "from-span"}),
    ]
    conv = _conv(spark, rows, resource_tags={"server_name": "res"},
                 library_name="L", library_version="2")
    got = {r["span_id"]: r for r in conv.collect()}
    assert (got["a"]["status"], got["b"]["status"], got["c"]["status"]) == \
        ("ok", "unknown", "unknown")
    assert "status_message=fine" in got["a"]["tags_s"]
    assert "status_message" not in got["b"]["tags_s"]
    assert "status_message=error code 7" in got["c"]["tags_s"]
    # resource tags overwrite span attrs (go:164-166)
    assert got["d"]["tags_s"] == \
        "library_name=L,library_version=2,server_name=res,span_kind=server"


def test_assembly_chain_and_orphans(spark):
    rows = [
        _span("t1", "r", ""),             # root
        _span("t1", "c1", "r"),           # direct child
        _span("t1", "c2", "c1"),          # 2-deep: needs fixed point
        _span("t1", "o", "missing"),      # orphan → own transaction
        _span("t1", "oc", "o"),           # child of orphan → still orphan
        _span("t2", "x", "nowhere"),      # rootless trace, batch has roots
    ]
    out = sentry_transactions(_conv(spark, rows))
    got = {r["span_id"]: (r["root_id"], r["role"]) for r in out.collect()}
    assert got == {
        "r": ("r", "root"), "c1": ("r", "child"), "c2": ("r", "child"),
        "o": ("o", "orphan"), "oc": ("oc", "orphan"),
        "x": ("x", "orphan"),
    }


def test_no_root_batch_drops_everything(spark):
    # pushTraceData:97-99 — no transactions at all → whole batch dropped
    rows = [_span("t1", "a", "gone"), _span("t2", "b", "gone")]
    assert sentry_transactions(_conv(spark, rows)).count() == 0
