"""windowsperfcounters / jmx / prometheus_exec / awsprw + signalfx
receiver-side translation tests (table-driven, SURVEY §5 style)."""

from __future__ import annotations

import pytest

from opentelemetry_collector_contrib_spark.operators.jmx import (
    jmx_gatherer_properties, jmx_service_url, jmx_service_url_column,
    jmx_subprocess_invocation, validate_jmx_config)
from opentelemetry_collector_contrib_spark.operators.promexec import (
    compute_crash_count, extract_name, extract_name_column,
    fill_port_placeholders, fill_port_placeholders_column, get_delay,
    scrape_job)
from opentelemetry_collector_contrib_spark.operators.sfx_receive import (
    sfx_datapoints_to_metrics, sfx_events_to_logs)
from opentelemetry_collector_contrib_spark.operators.winperf import (
    counter_path, expand_counter_paths, expand_instances, winperf_gauges)
from opentelemetry_collector_contrib_spark.sinks.awsprw import (
    canonical_request, sigv4_sign)

from conftest import rows


# ---------------------------------------------------------------------------
# windowsperfcounters
# ---------------------------------------------------------------------------

def test_expand_instances():
    # config_windows.go:19-31
    assert expand_instances([]) == [""]
    assert expand_instances(["a", "*", "b"]) == ["*"]
    assert expand_instances(["a", "b"]) == ["a", "b"]


def test_counter_path():
    # windowsperfcounters_scraper.go:86-92
    assert counter_path("Memory", "", "Committed Bytes") == \
        "\\Memory\\Committed Bytes"
    assert counter_path("Processor", "*", "% Processor Time") == \
        "\\Processor(*)\\% Processor Time"


def test_expand_counter_paths_order():
    cfg = [{"object": "Processor", "instances": ["1", "2"],
            "counters": ["% Idle Time", "% User Time"]},
           {"object": "Memory", "counters": ["Committed Bytes"]}]
    assert expand_counter_paths(cfg) == [
        "\\Processor(1)\\% Idle Time", "\\Processor(1)\\% User Time",
        "\\Processor(2)\\% Idle Time", "\\Processor(2)\\% User Time",
        "\\Memory\\Committed Bytes"]


def test_winperf_gauges_total_rules(spark):
    scraped = spark.createDataFrame(
        [
            # wildcard expansion returning many instances: _Total dropped
            ("s1", "Processor", "*", "% Processor Time", "0", 10.0),
            ("s1", "Processor", "*", "% Processor Time", "1", 20.0),
            ("s1", "Processor", "*", "% Processor Time", "_Total", 30.0),
            # single _Total value: instance label cleared
            ("s1", "LogicalDisk", "_Total", "% Free Space", "_Total", 55.0),
            # instance-less counter: no instance label
            ("s1", "Memory", "", "Committed Bytes", "", 99.0),
        ],
        "scrape_id string, object string, instance_cfg string, "
        "counter string, instance_name string, value double")
    got = rows(winperf_gauges(scraped))
    assert got == sorted([
        ("s1", "\\Processor(*)\\% Processor Time", "0", 10.0),
        ("s1", "\\Processor(*)\\% Processor Time", "1", 20.0),
        ("s1", "\\LogicalDisk(_Total)\\% Free Space", None, 55.0),
        ("s1", "\\Memory\\Committed Bytes", None, 99.0),
    ], key=lambda t: tuple((v is None, str(v)) for v in t))


# ---------------------------------------------------------------------------
# signalfx receiver-side translation
# ---------------------------------------------------------------------------

def test_sfx_datapoint_type_matrix(spark):
    dps = spark.createDataFrame(
        [
            ("a", "cpu", "GAUGE", None, 1.5, 1000, {"host": "h1"}),
            ("b", "cpu", "GAUGE", 7, None, 1000, {}),
            ("c", "reqs", "COUNTER", 3, None, 2000, {}),
            ("d", "reqs", "COUNTER", None, 2.0, 2000, {}),
            ("e", "total", "CUMULATIVE_COUNTER", 9, None, 3000, {}),
            ("f", "total", "CUMULATIVE_COUNTER", None, 4.5, 3000, {}),
            ("g", "nil", "GAUGE", None, None, 4000, {}),       # nil datum
            ("h", "enum", "ENUM", 1, None, 5000, {}),          # unknown type
        ],
        "dp_id string, metric string, metric_type string, int_value long, "
        "double_value double, timestamp_ms long, "
        "dimensions map<string,string>")
    out = sfx_datapoints_to_metrics(dps)
    got = {r["dp_id"]: r.asDict() for r in out.collect()}
    assert set(got) == {"a", "b", "c", "d", "e", "f"}  # g, h dropped
    assert got["a"]["data_type"] == "DoubleGauge"
    assert got["a"]["temporality"] is None
    assert got["a"]["value_d"] == 1.5 and got["a"]["value_i"] is None
    assert got["a"]["ts_ns"] == 1000 * 1_000_000
    assert got["b"]["data_type"] == "IntGauge" and got["b"]["value_i"] == 7
    assert (got["c"]["data_type"], got["c"]["temporality"],
            got["c"]["monotonic"]) == ("IntSum", "delta", True)
    assert got["d"]["data_type"] == "DoubleSum"
    assert (got["e"]["data_type"], got["e"]["temporality"]) == \
        ("IntSum", "cumulative")
    assert (got["f"]["data_type"], got["f"]["temporality"]) == \
        ("DoubleSum", "cumulative")


def test_sfx_events_typed_properties(spark):
    events = spark.createDataFrame(
        [("e1", "deploy", 1000000, 1500,
          {"env": "prod"},
          {"s": ("x", None, None, None), "i": (None, 4, None, None),
           "d": (None, None, 2.5, None), "b": (None, None, None, True),
           "n": (None, None, None, None)}),
         ("e2", "alert", 2000000, None, {}, {})],
        "event_id string, event_type string, timestamp_ms long, "
        "category long, dimensions map<string,string>, "
        "properties map<string,struct<str_v:string,int_v:long,"
        "double_v:double,bool_v:boolean>>")
    out = {r["event_id"]: r.asDict()
           for r in sfx_events_to_logs(events).collect()}
    assert out["e1"]["ts_ns"] == 1000000 * 1_000_000
    assert out["e1"]["category"] == 1500
    assert out["e1"]["properties_typed"] == {
        "s": "s:x", "i": "i:4", "d": "d:2.5", "b": "b:true", "n": "null"}
    # category nil -> attribute still present as explicit null
    assert out["e2"]["category"] is None


# ---------------------------------------------------------------------------
# jmx
# ---------------------------------------------------------------------------

def test_jmx_service_url():
    # receiver.go:132-149
    assert jmx_service_url("service:jmx:rmi:///jndi/rmi://h:1/jmxrmi") == \
        "service:jmx:rmi:///jndi/rmi://h:1/jmxrmi"
    assert jmx_service_url("myhost:7199") == \
        "service:jmx:rmi:///jndi/rmi://myhost:7199/jmxrmi"
    with pytest.raises(ValueError):
        jmx_service_url("no-port-here")


def test_jmx_service_url_column_parity(spark):
    eps = ["service:jmx:rmi:///jndi/rmi://h:1/jmxrmi", "myhost:7199",
           "bad"]
    df = spark.createDataFrame([(e,) for e in eps], "endpoint string")
    from pyspark.sql import functions as F
    got = [r[0] for r in df.select(
        jmx_service_url_column(F.col("endpoint"))).collect()]
    assert got[0] == eps[0]
    assert got[1] == jmx_service_url("myhost:7199")
    assert got[2] is None


def test_jmx_gatherer_properties_golden():
    # exact field order of receiver.go:151-175
    doc = jmx_gatherer_properties(
        "host:7199", 10000, "0.0.0.0:4317", 5000,
        target_system="jvm", groovy_script="ignored.groovy",
        username="u", password="p")
    assert doc == (
        "otel.jmx.service.url = "
        "service:jmx:rmi:///jndi/rmi://host:7199/jmxrmi\n"
        "otel.jmx.interval.milliseconds = 10000\n"
        "otel.jmx.target.system = jvm\n"       # target wins over groovy
        "otel.exporter = otlp\n"
        "otel.exporter.otlp.endpoint = 0.0.0.0:4317\n"
        "otel.exporter.otlp.metric.timeout = 5000\n"
        "otel.jmx.username = u\n"
        "otel.jmx.password = p\n")
    # groovy only when no target system; no creds lines when empty
    doc2 = jmx_gatherer_properties("h:1", 5000, "e:1", 100,
                                   groovy_script="s.groovy")
    assert "otel.jmx.groovy.script = s.groovy\n" in doc2
    assert "username" not in doc2 and "password" not in doc2


def test_jmx_validation_and_invocation():
    with pytest.raises(ValueError, match="endpoint"):
        validate_jmx_config({"target_system": "jvm"})
    with pytest.raises(ValueError, match="target_system"):
        validate_jmx_config({"endpoint": "h:1"})
    validate_jmx_config({"endpoint": "h:1", "groovy_script": "g"})
    assert jmx_subprocess_invocation("/opt/gatherer.jar") == [
        "java", "-Dorg.slf4j.simpleLogger.defaultLogLevel=debug",
        "-jar", "/opt/gatherer.jar", "-config", "-"]


# ---------------------------------------------------------------------------
# prometheus_exec
# ---------------------------------------------------------------------------

def test_extract_name():
    # receiver.go:144-153
    assert extract_name("prometheus_exec/postgres") == "postgres"
    assert extract_name("prometheus_exec/a/b") == "a/b"   # SplitN(.., 2)
    assert extract_name("prometheus_exec/") == "prometheus_exec"
    assert extract_name("prometheus_exec") == "prometheus_exec"


def test_extract_name_column_parity(spark):
    from pyspark.sql import functions as F
    names = ["prometheus_exec/postgres", "prometheus_exec/a/b",
             "prometheus_exec/", "prometheus_exec"]
    df = spark.createDataFrame([(n,) for n in names], "n string")
    got = [r[0] for r in
           df.select(extract_name_column(F.col("n"))).collect()]
    assert got == [extract_name(n) for n in names]


def test_fill_port_placeholders():
    cmd, env = fill_port_placeholders(
        "postgres_exporter --web.listen-address=:{{port}}",
        [("DATA_SOURCE_NAME", "port={{port}} user=x"), ("OTHER", "y")],
        9187)
    assert cmd == "postgres_exporter --web.listen-address=:9187"
    assert env == [("DATA_SOURCE_NAME", "port=9187 user=x"), ("OTHER", "y")]


def test_fill_port_placeholders_column_parity(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [("exporter --p={{port}} --q={{port}}", 9187)],
        "command string, port int")
    got = df.select(fill_port_placeholders_column(
        F.col("command"), F.col("port"))).first()[0]
    assert got == "exporter --p=9187 --q=9187"


def test_backoff_and_crash_count():
    # receiver.go:271-279, 307-316
    assert compute_crash_count(31 * 60, 99) == 1       # healthy resets
    assert compute_crash_count(10, 2) == 3
    assert get_delay(31 * 60, 10) == 1.0               # healthy -> initial
    assert get_delay(10, 3) == 1.0                     # <= allowed crashes
    assert get_delay(10, 5, rand_u=0.0) == 4.0         # 2^(5-3)
    assert get_delay(10, 6, rand_u=1.0) == 16.0        # 2^(6-3+1)


def test_scrape_job_defaults():
    job = scrape_job("prometheus_exec/mysqld", 9104, 60)
    assert job == {"job_name": "mysqld", "scrape_interval_s": 60,
                   "scrape_timeout_s": 10, "scheme": "http",
                   "metrics_path": "/metrics", "honor_labels": False,
                   "honor_timestamps": True, "target": "localhost:9104"}


# ---------------------------------------------------------------------------
# awsprw SigV4
# ---------------------------------------------------------------------------

AWS_EXAMPLE = dict(
    method="GET",
    url="https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
    headers={"content-type":
             "application/x-www-form-urlencoded; charset=utf-8",
             "host": "iam.amazonaws.com",
             "x-amz-date": "20150830T123600Z"},
    body=b"")


def test_sigv4_matches_aws_documented_example():
    """The worked example from AWS's public SigV4 documentation."""
    import hashlib
    canon, signed = canonical_request(
        AWS_EXAMPLE["method"], AWS_EXAMPLE["url"],
        AWS_EXAMPLE["headers"], AWS_EXAMPLE["body"])
    assert hashlib.sha256(canon.encode()).hexdigest() == \
        "f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59"
    assert signed == "content-type;host;x-amz-date"
    out = sigv4_sign(
        AWS_EXAMPLE["method"], AWS_EXAMPLE["url"], AWS_EXAMPLE["headers"],
        AWS_EXAMPLE["body"], "us-east-1", "iam", "20150830T123600Z",
        "AKIDEXAMPLE", "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY")
    assert out["Authorization"] == (
        "AWS4-HMAC-SHA256 "
        "Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, "
        "SignedHeaders=content-type;host;x-amz-date, "
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06"
        "b5924a6f2b5d7")


def test_sigv4_gates():
    # auth.go:112-114: no region/service -> passthrough, original intact
    h = {"host": "x"}
    out = sigv4_sign("POST", "https://x/w", h, b"b", "", "aps",
                     "20200101T000000Z", "k", "s")
    assert out == h and out is not h and "Authorization" not in h
    # auth.go:95-97: creds required once active
    with pytest.raises(ValueError, match="credentials"):
        sigv4_sign("POST", "https://x/w", h, b"b", "us-east-1", "aps",
                   "20200101T000000Z", "", "")


# ---------------------------------------------------------------------------
# YAML registry wiring
# ---------------------------------------------------------------------------

def test_config_driven_winperf_and_signalfx(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.plans.config import (
        build_from_config, load_config)
    p1 = str(tmp_path / "pdh.parquet")
    spark.createDataFrame(
        [("s1", "Memory", "", "Committed Bytes", "", 42.0)],
        "scrape_id string, object string, instance_cfg string, "
        "counter string, instance_name string, value double"
    ).write.parquet(p1)
    p2 = str(tmp_path / "sfx.parquet")
    spark.createDataFrame(
        [("a", "cpu", "GAUGE", None, 1.5, 1000, {"host": "h1"}),
         ("b", "bad", "ENUM", 1, None, 1000, {})],
        "dp_id string, metric string, metric_type string, int_value long, "
        "double_value double, timestamp_ms long, "
        "dimensions map<string,string>").write.parquet(p2)
    cfg = load_config(f"""
receivers:
  pdh: {{type: winperf, path: {p1}}}
  sfx: {{type: signalfx, path: {p2}}}
service:
  pipelines:
    win: {{receivers: [pdh], processors: []}}
    sfx: {{receivers: [sfx], processors: []}}
""")
    win = build_from_config(spark, cfg, pipeline="win").collect()
    assert [(r.metric_name, r.value) for r in win] == \
        [("\\Memory\\Committed Bytes", 42.0)]
    sfx = build_from_config(spark, cfg, pipeline="sfx").collect()
    assert [(r.dp_id, r.data_type) for r in sfx] == [("a", "DoubleGauge")]


def test_sigv4_case_insensitive_amz_date_and_encoded_query():
    # a caller-supplied 'X-Amz-Date' must not be signed twice
    out = sigv4_sign("GET", "https://x.amazonaws.com/",
                     {"X-Amz-Date": "20200101T000000Z", "host": "x"},
                     b"", "us-east-1", "aps", "20200101T000000Z", "k", "s")
    assert "x-amz-date" not in out          # no duplicate added
    assert "SignedHeaders=host;x-amz-date," in out["Authorization"]
    # pre-encoded query values are decoded once, not double-encoded
    canon, _ = canonical_request(
        "GET", "https://x/api?label=a%2Fb&plain=c", {"host": "x"}, b"")
    query_line = canon.split("\n")[2]
    assert query_line == "label=a%2Fb&plain=c"   # not a%252Fb
