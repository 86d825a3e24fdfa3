"""stackdriver exporter analog vs reference semantics
(exporter/stackdriverexporter/resource_mapper.go, spandata.go)."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sinks.stackdriver import (
    map_resource, ot_spans)

_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, "
    "kind string, status string, status_message string, start_ns long, "
    "end_ns long, attrs_s map<string,string>, attrs_i map<string,long>, "
    "attrs_b map<string,boolean>, attrs_d map<string,double>, "
    "resource_type string, resource_labels map<string,string>, "
    "links array<struct<trace_id:string,span_id:string,"
    "attrs:map<string,string>>>, "
    "events array<struct<name:string,time_ns:long,"
    "eattrs:map<string,string>>>, "
    "dropped_attrs int, dropped_events int, dropped_links int, "
    "il_name string, il_version string")

_DEFAULTS = dict(
    trace_id="a" * 32, span_id="b" * 16, parent_span_id=None, name="call",
    kind="server", status="ok", status_message="", start_ns=10 ** 18,
    end_ns=10 ** 18 + 500, attrs_s=None, attrs_i=None, attrs_b=None,
    attrs_d=None, resource_type="", resource_labels=None, links=None,
    events=None, dropped_attrs=0, dropped_events=0, dropped_links=0,
    il_name="", il_version="")

_ORDER = ("trace_id span_id parent_span_id name kind status status_message "
          "start_ns end_ns attrs_s attrs_i attrs_b attrs_d resource_type "
          "resource_labels links events dropped_attrs dropped_events "
          "dropped_links il_name il_version").split()


def _row(**kw):
    d = dict(_DEFAULTS)
    d.update(kw)
    return tuple(d[k] for k in _ORDER)


MAPPINGS = [
    {"source_type": "k8s_container", "target_type": "gke",
     "label_mappings": [("cluster", "cluster_name", False),
                        ("ns", "namespace_name", True)]},
    {"source_type": "k8s_container", "target_type": "alt",
     "label_mappings": [("other", "o", False)]},
]


def _run(spark, rows, mappings=MAPPINGS):
    df = spark.createDataFrame(rows, _SCHEMA)
    return [r.asDict() for r in ot_spans(df, mappings).collect()]


def test_resource_mapper_first_match_required_optional_fallback(spark):
    # resource_mapper.go:28-46 — in-order first match; a missing
    # REQUIRED label skips the mapping; optional renamed when present
    out = _run(spark, [
        _row(span_id="0" * 15 + "1", resource_type="k8s_container",
             resource_labels={"cluster": "c1", "ns": "n1", "x": "y"}),
        _row(span_id="0" * 15 + "2", resource_type="k8s_container",
             resource_labels={"cluster": "c1"}),
        _row(span_id="0" * 15 + "3", resource_type="k8s_container",
             resource_labels={"other": "o1"}),       # M1 misses -> M2
        _row(span_id="0" * 15 + "4", resource_type="k8s_container",
             resource_labels={"x": "y"}),            # both miss -> global
        _row(span_id="0" * 15 + "5", resource_type="gce_instance",
             resource_labels={"cluster": "c1"}),     # type mismatch
    ])
    a = {r["span_id"]: (r["mr_type"], r["mr_labels"]) for r in out}
    # unmapped labels ("x") are NOT carried through (:55-65)
    assert a["0" * 15 + "1"] == ("gke", "cluster_name=c1|namespace_name=n1")
    assert a["0" * 15 + "2"] == ("gke", "cluster_name=c1")
    assert a["0" * 15 + "3"] == ("alt", "o=o1")
    assert a["0" * 15 + "4"] == ("global", "")
    assert a["0" * 15 + "5"] == ("global", "")


def test_span_kind_and_status_tables(spark):
    # spandata.go:87-104 — UNSPECIFIED folds into internal; :106-115
    kinds = ["unspecified", "internal", "server", "client", "producer",
             "consumer", "bogus"]
    out = _run(spark, [
        _row(span_id=("%016d" % i), kind=k,
             status=["ok", "error", ""][i % 3])
        for i, k in enumerate(kinds)])
    got = {r["span_id"]: (r["ot_kind"], r["ot_status"]) for r in out}
    assert [got["%016d" % i][0] for i in range(7)] == [
        "internal", "internal", "server", "client", "producer",
        "consumer", "unspecified"]
    assert [got["%016d" % i][1] for i in range(7)] == [
        "ok", "error", "unset", "ok", "error", "unset", "ok"]


def test_attr_merge_span_wins_and_link_event_attrs_isolated(spark):
    # spandata.go:117-139 — resource attrs appended FIRST, span attrs
    # second: span wins in the attribute map; links/events use an
    # EMPTY resource (:151, :164)
    out = _run(spark, [
        _row(span_id="0" * 15 + "1",
             attrs_s={"k": "span"}, attrs_i={"n": 7},
             resource_labels={"k": "res", "only_res": "r"},
             links=[("c" * 32, "d" * 16, {"lk": "lv"}),
                    ("0" * 32, "0" * 16, None)],
             events=[("ev1", 123, {"ek": "ev"}), ("", 456, None)]),
    ])
    r = out[0]
    assert r["attrs_s_out"] == ("k=STRING:span|n=LONG:7|"
                                "only_res=STRING:r")
    assert r["links_s"] == ("c" * 32 + "@" + "d" * 16 + "@lk=STRING:lv;"
                            + "0" * 32 + "@" + "0" * 16 + "@")
    assert r["events_s"] == "ev1@123@ek=STRING:ev;@456@"
    assert r["mr_type"] == "global"


def test_passthrough_fields(spark):
    out = _run(spark, [
        _row(span_id="0" * 15 + "1", parent_span_id=None, name=None,
             dropped_attrs=3, dropped_events=2, dropped_links=1,
             il_name="otel-sdk", il_version="0.13")])
    r = out[0]
    assert r["parent_id"] == "" and r["span_name"] == ""
    assert (r["dropped_attrs"], r["dropped_events"],
            r["dropped_links"]) == (3, 2, 1)
    assert (r["il_name"], r["il_version"]) == ("otel-sdk", "0.13")


def test_map_resource_plan_is_codegen(spark):
    # the config loop unrolls to one when() chain: no Python stage
    df = spark.createDataFrame(
        [_row()], _SCHEMA)
    plan = map_resource(df, MAPPINGS)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
