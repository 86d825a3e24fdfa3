"""splunkhecexporter analog — envelope routing, histogram buckets."""

from opentelemetry_collector_contrib_spark.sinks.splunkhec import (
    hec_log_events, hec_metric_events)

_LOGS = ("ts_ns long, body string, attrs map<string,string>, "
         "attrs_int map<string,long>, attrs_bool map<string,boolean>")
_PTS = ("name string, mtype string, ts_ns long, ival long, dval double, "
        "hsum double, hcount long, bounds array<double>, "
        "counts array<long>, labels map<string,string>, "
        "resource map<string,string>")


def test_log_envelope_and_field_exclusion(spark):
    rows = [
        (1_500_000_000_123_499_999, "b1",
         {"host.name": "h", "service.name": "s", "com.splunk.index": "i",
          "k": "v"}, {"n": 3}, {"f": True}),
        (0, "b2", {}, {}, {}),
    ]
    got = hec_log_events(spark.createDataFrame(rows, _LOGS),
                         source="S", sourcetype="T", index="I").collect()
    one = got[0].asDict()
    # envelope attrs routed out of fields
    assert (one["host"], one["source"], one["index"]) == ("h", "s", "i")
    assert one["sourcetype"] == "T"
    assert one["fields_s"] == "f=true,k=v,n=3"
    # Go computes math.Round(float64(ns)/1e6): at 1.5e18 ns the double
    # ulp is ~0.24 ms, so .499999 snaps to the .5 double and rounds UP —
    # the Spark float path reproduces Go exactly
    assert one["time"] == 1_500_000_000.124
    two = got[1].asDict()
    assert two["time"] is None                    # zero ts omitted
    assert (two["host"], two["source"]) == ("unknown", "S")


def _hist(name, bounds, counts, res=None, labels=None):
    return (name, "histogram", 10**9, 0, 0.0, 9.5, 7, bounds, counts,
            labels or {}, res or {})


def test_histogram_buckets_cumulative_and_skip(spark):
    rows = [
        _hist("lat", [0.5, 2.0], [3, 4, 5]),
        _hist("bad", [0.5], [1, 2, 3]),          # len mismatch -> skip
        _hist("nob", [], [6]),                   # no bounds -> +Inf only
    ]
    got = hec_metric_events(spark.createDataFrame(rows, _PTS)).collect()
    fields = [r["fields_s"] for r in got]
    assert "le=0.5,metric_name:lat_bucket=3" in fields
    assert "le=2,metric_name:lat_bucket=7" in fields      # %g drops .0
    assert "le=+Inf,metric_name:lat_bucket=12" in fields
    assert "metric_name:lat_sum=9.5" in fields
    assert "metric_name:lat_count=7" in fields
    bad = [f for f in fields if "bad" in f]
    assert sorted(bad) == ["metric_name:bad_count=7",
                           "metric_name:bad_sum=9.5"]
    nob = [f for f in fields if "nob" in f]
    assert "le=+Inf,metric_name:nob_bucket=6" in nob
    assert len(nob) == 3
    assert all(r["event"] == "metric" for r in got)


def test_labels_overlay_resource(spark):
    rows = [("g", "int_gauge", 10**9, 42, 0.0, 0.0, 0, [], [1],
             {"x": "lab"}, {"x": "res", "host.name": "hh"})]
    got = hec_metric_events(spark.createDataFrame(rows, _PTS)).collect()
    one = got[0].asDict()
    assert one["host"] == "hh"
    # labels win over resource; resource attrs stay in fields
    assert one["fields_s"] == "host.name=hh,metric_name:g=42,x=lab"
