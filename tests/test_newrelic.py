"""newrelicexporter analog — attribute battery and drop rules."""

from opentelemetry_collector_contrib_spark.sinks.newrelic import (
    newrelic_spans)

_S = ("trace_id string, span_id string, parent_span_id string, "
      "name string, kind string, start_ns long, end_ns long, "
      "status_code int, status_message string, attrs map<string,string>, "
      "resource map<string,string>, lib_name string, lib_version string, "
      "n_events int")


def _row(tid="t" * 32, sid="s" * 16, code=0, msg="", kind=None,
         attrs=None, res=None, lib="", ver=""):
    return (tid, sid, None, "nm", kind, 100, 350, code, msg,
            attrs or {}, res or {}, lib, ver, 0)


def test_newrelic_attr_battery(spark):
    rows = [
        _row(code=2, msg="bad", kind="server",
             attrs={"k": "span", "collector.name": "spoof"},
             res={"k": "res"}, lib="L", ver="9"),
        _row(sid="x" * 16, code=2, msg=""),      # code set, no desc
        _row(sid="y" * 16, code=0, msg="hi"),    # Unset: no code, no desc
        _row(sid="z" * 16, lib="L", ver=""),     # name without version
        _row(sid=""),                            # invalid id -> dropped
        _row(tid=""),                            # invalid trace -> dropped
    ]
    out = newrelic_spans(spark.createDataFrame(rows, _S))
    got = {r["span_id"]: r.asDict() for r in out.collect()}
    assert len(got) == 4
    one = got["s" * 16]
    assert one["duration_ns"] == 250 and one["parent_id"] == ""
    assert one["attrs_s"] == (
        "collector.name=opentelemetry-collector,collector.version=0.0.0,"
        "instrumentation.name=L,instrumentation.version=9,k=span,"
        "otel.status_code=ERROR,otel.status_description=bad,"
        "span.kind=server")
    assert "otel.status_description" not in got["x" * 16]["attrs_s"]
    assert "otel.status_code" not in got["y" * 16]["attrs_s"]
    z = got["z" * 16]["attrs_s"]
    assert "instrumentation.name=L" in z
    assert "instrumentation.version" not in z
