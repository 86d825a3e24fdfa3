"""honeycombexporter analog — id collapse, status fallback, sample rate."""

from opentelemetry_collector_contrib_spark.sinks.honeycomb import (
    honeycomb_events)

_SPANS = ("trace_id string, span_id string, parent_span_id string, "
          "name string, kind string, start_ns long, end_ns long, "
          "status_code int, status_message string, "
          "attrs map<string,string>, attrs_int map<string,long>, "
          "resource map<string,string>, lib_name string, "
          "lib_version string")


def _span(tid, sid, parent=None, kind="client", code=0, msg="",
          attrs=None, ints=None, res=None, lib="L", ver="9"):
    return (tid, sid, parent, "nm", kind, 1_000_000_000, 2_500_000_000,
            code, msg, attrs or {}, ints or {}, res or {}, lib, ver)


def test_span_event_rules(spark):
    zeros = "0" * 16
    rows = [
        _span(zeros + "a" * 16, "s1", code=2, ints={"sr": 4},
              attrs={"k": "span"}, res={"k": "res", "r": "1"}),
        _span("b" * 32, "s2", parent="p2", kind="weird", code=9,
              msg="", attrs={"sr": "11"}),   # string-typed rate ignored
        _span("c" * 32, "s3", code=1, msg="custom", lib="", ver=""),
    ]
    df = spark.createDataFrame(rows, _SPANS)
    got = {r["span_id"]: r.asDict() for r in
           honeycomb_events(df, sample_rate_attribute="sr").collect()}
    one = got["s1"]
    assert one["trace_id"] == "a" * 16          # zero high half collapsed
    assert one["parent_id"] is None
    assert one["duration_ms"] == 1500.0
    assert one["status_message"] == "STATUS_CODE_ERROR"
    assert one["sample_rate"] == 4
    # span attrs overlay resource; library fields present
    assert one["fields_s"] == \
        "k=span,library.name=L,library.version=9,r=1,sr=4"
    two = got["s2"]
    assert two["trace_id"] == "b" * 32
    assert two["span_kind"] == "unspecified"
    assert two["status_message"] == "9"          # out-of-range: decimal
    assert two["sample_rate"] is None            # int64-typed only
    three = got["s3"]
    assert three["status_message"] == "custom"
    assert "library" not in three["fields_s"]    # empty lib fields dropped


def test_span_events_and_links(spark):
    spans = spark.createDataFrame([_span("d" * 32, "s1")], _SPANS)
    events = spark.createDataFrame(
        [("d" * 32, "s1", "nm", "evt", 7, {"e": "1"}, {}, {"r": "x"})],
        "trace_id string, span_id string, span_name string, "
        "event_name string, ts_ns long, attrs map<string,string>, "
        "attrs_int map<string,long>, resource map<string,string>")
    links = spark.createDataFrame(
        [("d" * 32, "s1", "e" * 32, "f" * 16, {"l": "1"}, {})],
        "trace_id string, span_id string, link_trace_id string, "
        "link_span_id string, attrs map<string,string>, "
        "attrs_int map<string,long>")
    out = honeycomb_events(spans, events, links)
    by_ann = {r["annotation_type"]: r.asDict() for r in out.collect()}
    ev = by_ann["span_event"]
    assert ev["parent_id"] == "s1" and ev["parent_name"] == "nm"
    assert ev["fields_s"] == "e=1,r=x"           # resource underlay
    ln = by_ann["link"]
    assert ln["link_span_id"] == "f" * 16
    assert ln["fields_s"] == "l=1"               # no resource on links
