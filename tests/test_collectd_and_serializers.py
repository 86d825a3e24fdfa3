"""collectd JSON parsing (against the reference's own fixture) and
protocol serializer round-trips."""

import json

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.carbon import parse_plaintext
from opentelemetry_collector_contrib_spark.operators.collectd import parse_collectd
from opentelemetry_collector_contrib_spark.operators.json_parser import (
    splunk_hec_events)
from opentelemetry_collector_contrib_spark.operators.statsd import parse_statsd
from opentelemetry_collector_contrib_spark.sinks.serializers import (
    to_carbon_line, to_hec_event, to_statsd_line)

from conftest import rows


COLLECTD_FIXTURE = json.dumps([
    {  # two-ds record -> dsname joins the metric name
        "dsnames": ["low", "high"], "dstypes": ["gauge", "gauge"],
        "host": "i-b13d1e5f", "interval": 10.0, "plugin": "fake",
        "plugin_instance": "", "time": 1415062577.496, "type": "load",
        "type_instance": "", "values": [0.2, 0.9],
    },
    {  # single-ds record -> dsname becomes a label; dims in brackets
        "dsnames": ["value"], "dstypes": ["derive"],
        "host": "h2", "interval": 10.0, "plugin": "memory",
        "plugin_instance": "", "time": 1415062577.0, "type": "memory",
        "type_instance": "used[region=us,az=a]", "values": ["1523"],
    },
    {  # event -> excluded from metrics
        "host": "mwp", "message": "my message", "severity": "OKAY",
        "time": 1435104306.0, "type": "imanotify",
        "type_instance": "notify_instance[k=v]",
    },
])


def test_collectd_parse_reference_shapes(spark):
    df = spark.createDataFrame([(COLLECTD_FIXTURE,)], "body string")
    out = {r["metric_name"]: r for r in parse_collectd(df).collect()}
    # two-ds record: type.dsname names (getReasonableMetricName)
    assert out["load.low"]["value"] == 0.2
    assert out["load.high"]["value"] == 0.9
    assert out["load.low"]["metric_type"] == "gauge"
    assert out["load.low"]["host"] == "i-b13d1e5f"
    assert out["load.low"]["dsname_label"] is None      # multi-ds
    # single-ds derive: name = type.instance (bracket dims stripped),
    # dsname demoted to a label, dims extracted
    r = out["memory.used"]
    assert r["metric_type"] == "cumulative"
    assert r["is_double"] is False and r["value"] == 1523.0
    assert r["dsname_label"] == "value"
    assert r["extracted_dims"] == {"region": "us", "az": "a"}
    # the event record is not a metric
    assert len(out) == 3


def test_carbon_roundtrip(spark):
    df = spark.createDataFrame(
        [("cpu.usage", {"host": "h1", "dc": "us"}, 42.5, 1598313600),
         ("mem.rss", {}, 7.25, 1598313601)],
        "metric_path string, tags map<string,string>, value double, ts long")
    lines = df.select(to_carbon_line(
        F.col("metric_path"), F.col("tags"), F.col("value"),
        F.col("ts")).alias("line"))
    back = parse_plaintext(lines)
    assert rows(back, "metric_path", "value", "ts") == \
        rows(df, "metric_path", "value", "ts")
    got = {r["metric_path"]: r["tags"] for r in back.collect()}
    assert got["cpu.usage"] == {"host": "h1", "dc": "us"}
    assert got["mem.rss"] == {}


def test_hec_roundtrip(spark):
    df = spark.createDataFrame(
        [(1598313600.5, "h1", "s", "st", "main", "hello", {"k": "v"})],
        "t double, h string, s string, st string, ix string, ev string, "
        "f map<string,string>")
    ser = df.select(to_hec_event(
        F.col("t"), F.col("h"), F.col("s"), F.col("st"), F.col("ix"),
        F.col("ev"), F.col("f")).alias("body"))
    back = splunk_hec_events(ser).collect()[0]
    assert back["ts_ns"] == 1598313600500000000
    assert back["host"] == "h1" and back["event_body"] == "hello"
    assert back["fields"]["k"] == "v"


def test_statsd_roundtrip(spark):
    df = spark.createDataFrame(
        [("req", 2.0, "c", 0.5, "env:prod,host:h1"),
         ("gauge1", 17.0, "g", 1.0, "")],
        "name string, raw double, mtype string, rate double, tags string")
    # serialize integral values the way statsd writes them (no '.0')
    v = F.when(F.col("raw") == F.col("raw").cast("long"),
               F.col("raw").cast("long").cast("string")) \
        .otherwise(F.col("raw").cast("string"))
    ser = df.select(to_statsd_line(
        F.col("name"), F.col("raw").cast("long"), F.col("mtype"),
        F.col("rate"), F.col("tags")).alias("line"))
    back = {r["name"]: r for r in parse_statsd(ser).collect()}
    assert back["req"]["value"] == 4.0          # 2 / 0.5 rate-scaled
    assert back["req"]["tags"] == "env:prod,host:h1"
    assert back["gauge1"]["value"] == 17.0
    assert back["gauge1"]["sample_rate"] == 1.0


PROM_LINES = [
    "# HELP http_requests_total Total requests.",
    "# TYPE http_requests_total counter",
    'http_requests_total{method="get",code="200"} 1027 1395066363000',
    'http_requests_total{method="post",code="200"} 3',
    "# TYPE temp gauge",
    "temp 23.5",
    'weird{msg="a \\"quoted\\" bit"} 1',
    "",
    "not a metric line at all !!!",
]


def test_prometheus_parse(spark):
    from opentelemetry_collector_contrib_spark.operators.prometheus import (
        parse_prometheus)
    df = spark.createDataFrame([(l,) for l in PROM_LINES], "line string")
    out = parse_prometheus(df)
    got = {(r["metric_name"], str(sorted((r["labels"] or {}).items()))): r
           for r in out.collect()}
    k1 = ("http_requests_total", str(sorted({"method": "get", "code": "200"}.items())))
    assert got[k1]["value"] == 1027.0
    assert got[k1]["ts_ms"] == 1395066363000
    assert got[k1]["metric_type"] == "counter"
    k2 = ("temp", "[]")
    assert got[k2]["value"] == 23.5 and got[k2]["metric_type"] == "gauge"
    k3 = ("weird", str(sorted({"msg": 'a "quoted" bit'}.items())))
    assert got[k3]["metric_type"] == "untyped"
    # malformed line kept + flagged
    bad = [r for r in out.collect() if r["valid"] is False]
    assert len(bad) == 1
