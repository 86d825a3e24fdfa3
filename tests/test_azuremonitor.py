"""azuremonitorexporter analog — kind routing, URL chains, status rules."""

from opentelemetry_collector_contrib_spark.sinks.azuremonitor import (
    azure_envelopes)

_SPANS = ("trace_id string, span_id string, parent_span_id string, "
          "name string, kind string, start_ns long, end_ns long, "
          "status_code int, deprecated_code int, status_message string, "
          "attrs map<string,string>, attrs_int map<string,long>, "
          "attrs_double map<string,double>, attrs_bool map<string,boolean>, "
          "resource map<string,string>, lib_name string, lib_version string")

_DAY_NS = 86_400_000_000_000


def _span(sid, kind="server", name="nm", start=1_000_000_000,
          end=2_500_000_000, code=0, dep=0, msg="", attrs=None, ints=None,
          dbls=None, bools=None, res=None, lib="il", ver="1"):
    return ("t" * 32, sid, "p" * 16, name, kind, start, end, code, dep, msg,
            attrs or {}, ints or {}, dbls or {}, bools or {}, res or {},
            lib, ver)


def _run(spark, rows):
    df = spark.createDataFrame(rows, _SPANS)
    return {r["item_id"]: r.asDict() for r in azure_envelopes(df).collect()}


def test_kind_routing_and_status_defaults(spark):
    got = _run(spark, [
        _span("s1", kind="server"),                      # request
        _span("s2", kind="producer"),                    # dependency
        _span("s3", kind="unspecified"),                 # -> InProc dep
        _span("s4", kind="consumer", code=0, dep=1),     # deprecated->ERROR
        _span("s5", kind="client", code=1, dep=2),       # code wins
        _span("s6", attrs={"faas.trigger": "http"}),     # dropped
    ])
    assert "s6" not in got
    assert got["s1"]["envelope_name"].endswith(".Request")
    assert got["s1"]["base_type"] == "RequestData"
    assert got["s2"]["base_type"] == "RemoteDependencyData"
    assert got["s3"]["dep_type"] == "InProc"
    assert (got["s4"]["response_code"], got["s4"]["success"]) == ("2", 0)
    assert (got["s5"]["response_code"], got["s5"]["success"]) == ("1", 1)


def test_http_request_name_url_and_status(spark):
    got = _run(spark, [
        _span("h1", attrs={"http.method": "GET", "http.route": "users",
                           "http.scheme": "https", "http.host": "ex.com",
                           "http.target": "u/1"},
              ints={"http.status_code": 500}),
        _span("h2", attrs={"http.method": "POST",
                           "http.scheme": "https", "http.server_name": "sv",
                           "http.target": "/x"},
              ints={"net.host.port": 8080}),
        _span("h3", kind="client",
              attrs={"http.method": "GET", "http.url": "http://a.b:9/c"}),
    ])
    assert got["h1"]["item_name"] == "GET /users"       # route "/"-prefixed
    assert got["h1"]["url"] == "https://ex.com/u/1"
    assert (got["h1"]["response_code"], got["h1"]["success"]) == ("500", 0)
    assert got["h2"]["url"] == "https://sv:8080/x"
    assert got["h2"]["operation_name"] == "POST nm"     # no route -> name
    dep = got["h3"]
    assert (dep["dep_type"], dep["dep_data"], dep["dep_target"]) == \
        ("HTTP", "http://a.b:9/c", "a.b:9")


def test_db_request_copies_nothing(spark):
    """A DB-typed SERVER span hits no switch case — attrs never copied
    (trace_to_envelope.go:167-176)."""
    attrs = {"db.system": "mysql", "db.statement": "SELECT 1"}
    got = _run(spark, [
        _span("d1", kind="server", attrs=attrs, ints={"x": 7},
              res={"rk": "rv"}),
        _span("d2", kind="client", attrs=attrs, ints={"x": 7},
              res={"rk": "rv"}),
    ])
    assert "db.system" not in got["d1"]["props_s"]
    assert got["d1"]["meas_s"] == ""
    assert got["d1"]["props_s"].startswith("instrumentationlibrary.name=il")
    assert "db.system=mysql" in got["d2"]["props_s"]
    assert got["d2"]["meas_s"] == "x=7.0"
    assert got["d2"]["dep_data"] == "SELECT 1"


def test_duration_and_rfc3339_trimming(spark):
    day = _span("t1", start=0, end=_DAY_NS + 3_723_000_456_999)
    frac = _span("t2", start=1_600_000_000_120_000_000,
                 end=1_600_000_000_120_000_000)
    whole = _span("t3", start=1_600_000_000_000_000_000,
                  end=1_600_000_000_000_000_000)
    got = _run(spark, [day, frac, whole])
    # 1 day + 1h2m3s + .000456999 -> µs truncation
    assert got["t1"]["duration"] == "01.01:02:03.000456"
    assert got["t2"]["time_rfc3339"] == "2020-09-13T12:26:40.12Z"
    assert got["t3"]["time_rfc3339"] == "2020-09-13T12:26:40Z"


def test_rpc_and_truncation(spark):
    got = _run(spark, [
        _span("r1", kind="server", name="Svc/M",
              attrs={"rpc.system": "grpc", "net.peer.name": "peer",
                     "net.peer.ip": "1.1.1.1"},
              ints={"rpc.grpc.status_code": 5, "net.peer.port": 443}),
        _span("r2", kind="client", name="Svc/M", dep=9,
              attrs={"rpc.system": "grpc", "net.peer.ip": "1.1.1.1"},
              ints={"rpc.grpc.status_code": 0}),
        _span("x1", name="y" * 1030),
    ])
    r1 = got["r1"]
    assert r1["item_name"] == "grpc Svc/M"
    assert r1["url"] == "grpc Svc/M"
    assert r1["response_code"] == "5"
    assert r1["source"] == "peer:443"               # name over ip
    r2 = got["r2"]
    assert r2["response_code"] == "9"               # grpc 0 -> deprecated
    assert r2["dep_data"] == "Svc/M"
    assert r2["dep_target"] == "1.1.1.1"            # port 0 -> no suffix
    assert len(got["x1"]["item_name"]) == 1024
