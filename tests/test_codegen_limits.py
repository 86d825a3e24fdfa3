"""Codegen plan pins for the two widest exporter projections.

Round-2 verdict: ``elastic_spans`` and ``azure_envelopes`` built ONE
flat Project whose generated method exceeded the JVM 64 KB limit
("ERROR CodeGenerator: ... Code grows beyond 64 KB"); Spark silently
fell back to interpreted evaluation — correct but several-x slower per
row.  Both are now staged into sequential ``select``s with named
intermediates so every codegen unit compiles.

The pin: run both batteries with ``spark.sql.codegen.fallback=false``,
under which ANY janino compile failure raises instead of silently
interpreting.  A regression that re-inflates a projection past 64 KB
fails this test loudly.
"""

import contextlib

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.elastic import (
    elastic_spans)
from opentelemetry_collector_contrib_spark.sinks.azuremonitor import (
    azure_envelopes)


@contextlib.contextmanager
def _no_codegen_fallback(spark):
    old_fb = spark.conf.get("spark.sql.codegen.fallback", "true")
    old_ws = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old_fb)
        spark.conf.set("spark.sql.codegen.wholeStage", old_ws)


_ELASTIC_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, "
    "kind string, start_ns long, end_ns long, status_code int, "
    "http_method string, http_url string, http_target string, "
    "http_host string, http_scheme string, http_status_code long, "
    "http_flavor string, http_server_name string, "
    "net_peer_name string, net_peer_ip string, net_peer_port int, "
    "net_host_name string, net_host_port int, "
    "db_system string, db_name string, db_statement string, db_user string")


def test_elastic_spans_compiles_without_fallback(spark):
    rows = [
        ("T", "s1", None, "nm", "client", 0, 2_000_000, 1, "GET",
         "https://ex.com:8443/a/b?q=1", None, None, None, 200, "1.1",
         None, None, None, None, None, None, None, None, None, None),
        ("T", "s2", "p", "nm", "client", 0, 1_000_000, 0, None, None,
         None, None, None, None, None, None, "peer", "1.2.3.4", 9042,
         None, None, "cassandra", "ks", "SELECT 1", "u"),
    ]
    df = spark.createDataFrame(rows, _ELASTIC_SCHEMA)
    with _no_codegen_fallback(spark):
        out = elastic_spans(df).collect()
    assert len(out) == 2


_AZURE_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, "
    "name string, kind string, start_ns long, end_ns long, "
    "status_code int, deprecated_code int, status_message string, "
    "attrs map<string,string>, attrs_int map<string,long>, "
    "attrs_double map<string,double>, attrs_bool map<string,boolean>, "
    "resource map<string,string>, lib_name string, lib_version string")


def test_azure_envelopes_compiles_without_fallback(spark):
    rows = [
        ("t" * 32, "s1", "p" * 16, "nm", "server", 10 ** 9,
         2 * 10 ** 9, 0, 0, "",
         {"http.method": "GET", "http.route": "users",
          "http.scheme": "https", "http.host": "ex.com",
          "http.target": "u/1"},
         {"http.status_code": 500}, {}, {}, {"service.name": "svc"},
         "il", "1"),
        ("t" * 32, "s2", "p" * 16, "nm", "client", 10 ** 9,
         3 * 10 ** 9, 0, 0, "",
         {"db.system": "mysql", "db.statement": "SELECT 1",
          "net.peer.name": "dbh"},
         {"net.peer.port": 3306}, {}, {}, {}, "il", "1"),
    ]
    df = spark.createDataFrame(rows, _AZURE_SCHEMA)
    with _no_codegen_fallback(spark):
        out = azure_envelopes(df).collect()
    assert len(out) == 2


def test_staged_projects_stay_codegen(spark):
    """The staged selects must still BE whole-stage-codegen'd (the fix
    would be hollow if staging pushed work into interpreted Projects):
    the executed plan string for each battery contains at least one
    starred (codegen) Project and no CollapseProject-defeating
    artifacts like 'InterpretedProjection'."""
    df = spark.createDataFrame(
        [("t" * 32, "s1", None, "nm", "server", 0, 10 ** 9, 0, 0, "",
          {}, {}, {}, {}, {}, "il", "1")], _AZURE_SCHEMA)
    plan = azure_envelopes(df)._jdf.queryExecution().executedPlan().toString()
    assert "*(1) Project" in plan or "*(1) ColumnarToRow" in plan
    assert "Interpreted" not in plan
