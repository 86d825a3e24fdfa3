"""elastic exporter analog — Java stacktrace parsing goldens."""

from opentelemetry_collector_contrib_spark.operators.elastic import (
    exception_errors, parse_java_stacktrace)

TRACE = (
    "java.lang.RuntimeException: boom\n"
    "\tat com.example/app.Main.run(Main.java:10)\n"
    "\tat app.Util.call(Util.java)\n"
    "\tSuppressed: java.lang.Exception: sup\n"
    "\t\tat app.Sup.x(Sup.java:1)\n"
    "\tat loader/mod/pkg.Cls.m(Cls.java:3)\n"
    "Caused by: java.io.IOException: io\n"
    "\tat app.IO.read(IO.java:7)\n"
    "\t... 2 more\n")


def test_parse_java_stacktrace_chain():
    chain = parse_java_stacktrace(TRACE)
    assert chain is not None and len(chain) == 2
    outer, cause = chain
    # suppressed block ignored — including the frame AFTER it at the
    # same indent as "Suppressed:" itself (the reference pops only on
    # strictly shallower indent, so that frame joins the throwaway)
    assert outer["frames"] == [
        ("com.example", "app.Main", "run", "Main.java", 10),
        ("", "app.Util", "call", "Util.java", 0),
    ]
    assert cause["message"] == "java.io.IOException: io"
    # "... 2 more" copies the LAST TWO enclosing frames
    assert cause["frames"] == [("", "app.IO", "read", "IO.java", 7),
                               outer["frames"][-2], outer["frames"][-1]]


def test_parse_errors_return_none():
    assert parse_java_stacktrace("Ex\n\tgarbage\n") is None
    assert parse_java_stacktrace("Ex\n\t... 1 more\n") is None  # no enclosing
    assert parse_java_stacktrace("Ex\n\nat a.b(c)\n") is None   # blank line


def test_exception_errors_rows(spark):
    rows = [
        (1, "t1", "s1", "RuntimeException", "boom", TRACE, True, "java"),
        (2, "t2", "s2", "E2", "", None, False, "java"),       # no trace
        (3, "t3", "s3", "E3", "m", "panic:\ngoroutine", False, "go"),
    ]
    df = spark.createDataFrame(
        rows, "ts_ns long, trace_id string, span_id string, "
        "exc_type string, exc_message string, exc_stacktrace string, "
        "exc_escaped boolean, language string")
    got = {(r["trace_id"], r["depth"]): r.asDict()
           for r in exception_errors(df).collect()}
    assert len(got) == 4
    outer = got[("t1", 0)]
    assert outer["type"] == "RuntimeException"
    assert outer["message"] == "boom" and outer["handled"] is False
    assert outer["n_frames"] == 2
    cause = got[("t1", 1)]
    assert cause["type"] is None
    assert cause["message"] == "java.io.IOException: io"
    assert cause["n_frames"] == 3
    assert got[("t2", 0)]["message"] == "[EMPTY]"       # empty -> [EMPTY]
    assert got[("t2", 0)]["raw_stacktrace"] is None     # absent trace: no attr
    go = got[("t3", 0)]
    assert go["raw_stacktrace"] == "panic:\ngoroutine"  # non-java fallback
    assert go["handled"] is True


_SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, "
    "kind string, start_ns long, end_ns long, status_code int, "
    "http_method string, http_url string, http_target string, "
    "http_host string, http_scheme string, http_status_code long, "
    "http_flavor string, http_server_name string, "
    "net_peer_name string, net_peer_ip string, net_peer_port int, "
    "net_host_name string, net_host_port int, "
    "db_system string, db_name string, db_statement string, db_user string")

_N = [None] * 17


def _sprow(sid, parent, kind, code=0, **kw):
    base = dict(zip(
        ["http_method", "http_url", "http_target", "http_host",
         "http_scheme", "http_status_code", "http_flavor",
         "http_server_name", "net_peer_name", "net_peer_ip",
         "net_peer_port", "net_host_name", "net_host_port",
         "db_system", "db_name", "db_statement", "db_user"], _N))
    base.update(kw)
    return ("T", sid, parent, "nm", kind, 0, 2_000_000, code,
            *base.values())


def test_elastic_transactions(spark):
    from opentelemetry_collector_contrib_spark.operators.elastic import (
        elastic_spans)
    rows = [
        _sprow("t1", None, "client", code=1, http_method="GET",
               http_url="https://ex.com:8443/a/b?q=1",
               http_flavor="1.1", http_status_code=200),
        _sprow("t2", "p", "server", code=2, http_target="/p?x=2",
               http_scheme="http", http_host="h.com:8080"),
        _sprow("t3", None, "internal", http_method="POST",
               net_host_name="nh", net_host_port=8081,
               net_peer_ip="9.9.9.9", net_peer_port=7),
        _sprow("t4", None, "client"),          # root, no request attrs
    ]
    df = spark.createDataFrame(rows, _SPAN_SCHEMA)
    got = {r["span_id"]: r.asDict() for r in elastic_spans(df).collect()}
    t1 = got["t1"]
    assert t1["kind_row"] == "transaction" and t1["tx_type"] == "request"
    assert (t1["url_protocol"], t1["url_hostname"], t1["url_port"]) == \
        ("https", "ex.com", "8443")
    assert (t1["url_path"], t1["url_search"]) == ("/a/b", "q=1")
    assert (t1["result"], t1["outcome"]) == ("OK", "success")
    assert t1["duration_ms"] == 2.0 and t1["status_code"] == 200
    t2 = got["t2"]
    assert (t2["url_protocol"], t2["url_hostname"], t2["url_port"]) == \
        ("http", "h.com", "8080")
    assert (t2["url_path"], t2["url_search"]) == ("/p", "x=2")
    assert (t2["result"], t2["outcome"]) == ("Error", "failure")
    t3 = got["t3"]
    assert (t3["url_protocol"], t3["url_hostname"], t3["url_port"]) == \
        ("http", "nh", "8081")                 # failsafe + net.host fallback
    assert t3["remote_addr"] == "9.9.9.9:7"
    t4 = got["t4"]
    assert t4["tx_type"] == "unknown" and t4["url_protocol"] is None
    assert t4["outcome"] == ""


def test_elastic_spans_destination_rules(spark):
    from opentelemetry_collector_contrib_spark.operators.elastic import (
        elastic_spans)
    rows = [
        _sprow("s1", "p", "client", http_url="http://svc.io/api?z=3"),
        _sprow("s2", "p", "client", http_url="https://svc.io:443/x"),
        _sprow("s3", "p", "client", http_target="/only",
               http_scheme="http", net_peer_name="np", net_peer_port=9000),
        _sprow("s4", "p", "client", http_target="/x", http_scheme="http",
               net_peer_name="np"),
        _sprow("s5", "p", "client", db_system="mysql", db_name="d",
               net_peer_ip="1.2.3.4"),
        _sprow("s6", "p", "client"),
    ]
    df = spark.createDataFrame(rows, _SPAN_SCHEMA)
    got = {r["span_id"]: r.asDict() for r in elastic_spans(df).collect()}
    s1 = got["s1"]
    assert (s1["span_type"], s1["span_subtype"]) == ("external", "http")
    # implicit default port: appended to the resource, not the URL
    assert (s1["dest_service_name"], s1["dest_service_resource"]) == \
        ("http://svc.io", "svc.io:80")
    assert (s1["dest_addr"], s1["dest_port"]) == ("svc.io", 80)
    s2 = got["s2"]
    # explicit default port: stripped from the service URL
    assert (s2["dest_service_name"], s2["dest_service_resource"]) == \
        ("https://svc.io", "svc.io:443")
    assert s2["dest_port"] == 443
    s3 = got["s3"]
    # URL host composed from net.peer.name:port
    assert (s3["dest_service_name"], s3["dest_service_resource"]) == \
        ("http://np:9000", "np:9000")
    assert (s3["dest_addr"], s3["dest_port"]) == ("np", 9000)
    s4 = got["s4"]
    # peer without port: host has no port, scheme default fills dest_port
    assert (s4["dest_service_name"], s4["dest_service_resource"]) == \
        ("http://np", "np:80")
    assert (s4["dest_addr"], s4["dest_port"]) == ("np", 80)
    s5 = got["s5"]
    assert (s5["span_type"], s5["span_subtype"]) == ("db", "mysql")
    assert (s5["dest_service_name"], s5["dest_service_resource"]) == \
        ("mysql", "mysql")
    assert (s5["dest_addr"], s5["dest_port"]) == ("1.2.3.4", 0)
    s6 = got["s6"]
    assert s6["span_type"] == "app" and s6["dest_addr"] is None
