"""httpforwarder request-rewrite semantics (operators/http_forwarder.py
vs extension/httpforwarder/extension.go:62-112)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.http_forwarder import (
    forward_requests)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "id int, url string, proto string, host string, "
        "headers map<string,string>")


def test_url_rewrite_keeps_path_and_query(spark):
    df = _df(spark, [(0, "http://in.example:5000/v1/logs?x=1&y=2",
                      "HTTP/1.1", "in.example:5000", {})])
    r = forward_requests(df, "https://gw.example:4318").collect()[0]
    assert r["fwd_url"] == "https://gw.example:4318/v1/logs?x=1&y=2"
    assert r["fwd_host"] == "gw.example:4318"


def test_extra_headers_added_and_merged(spark):
    df = _df(spark, [
        (0, "http://a/p", "HTTP/1.1", "a", {"X-Tenant": "old"}),
        (1, "http://a/p", "HTTP/1.1", "a", {}),
    ])
    out = {r["id"]: r["headers"]
           for r in forward_requests(
               df, "http://gw", {"X-Tenant": "edge"}).collect()}
    # Add on an existing key appends (RFC 7230 list combination)
    assert out[0]["X-Tenant"] == "old, edge"
    assert out[1]["X-Tenant"] == "edge"


def test_uppercase_scheme_still_rewritten(spark):
    # the egress validator is IGNORECASE; the JVM rewrite must match
    # the same way or HTTP://... keeps targeting the original host
    df = _df(spark, [(0, "HTTP://In.Example:5000/v1/logs?x=1",
                      "HTTP/1.1", "In.Example:5000", {})])
    r = forward_requests(df, "https://gw.example:4318").collect()[0]
    assert r["fwd_url"] == "https://gw.example:4318/v1/logs?x=1"


def test_header_add_is_case_insensitive(spark):
    # Go http.Header canonicalizes field names: an incoming 'x-tenant'
    # or 'VIA' merges into the canonical key, never a duplicate entry
    df = _df(spark, [
        (0, "http://a/p", "HTTP/1.1", "a", {"x-tenant": "old"}),
        (1, "http://a/p", "HTTP/1.1", "in.example",
         {"VIA": "HTTP/1.0 upstream"}),
    ])
    out = {r["id"]: r["headers"]
           for r in forward_requests(
               df, "http://gw", {"X-Tenant": "edge"}).collect()}
    assert out[0]["X-Tenant"] == "old, edge"
    assert "x-tenant" not in out[0]
    assert out[1]["Via"] == "HTTP/1.0 upstream, HTTP/1.1 in.example"
    assert "VIA" not in out[1]


def test_via_header_chains(spark):
    df = _df(spark, [
        (0, "http://a/p", "HTTP/1.1", "in.example",
         {"Via": "HTTP/1.0 upstream"}),
        (1, "http://a/p", "HTTP/2.0", "b.example", {}),
    ])
    out = {r["id"]: r["headers"]
           for r in forward_requests(df, "http://gw").collect()}
    assert out[0]["Via"] == "HTTP/1.0 upstream, HTTP/1.1 in.example"
    assert out[1]["Via"] == "HTTP/2.0 b.example"


def test_config_gates(spark):
    df = _df(spark, [(0, "http://a/p", "HTTP/1.1", "a", {})])
    with pytest.raises(ValueError, match="cannot be empty"):
        forward_requests(df, "")
    with pytest.raises(ValueError, match="valid URL"):
        forward_requests(df, "not a url")


def test_pure_catalyst_plan(spark):
    df = _df(spark, [(0, "http://a/p", "HTTP/1.1", "a", {})])
    plan = (forward_requests(df, "http://gw", {"K": "v"})
            ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan and "Exchange" not in plan
