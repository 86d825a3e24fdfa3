"""Driver-contract queries for the round-2b exporter analogs.

Same house pattern as queries_scrape: span batteries are synthesized
deterministically from the DISTINCT carbon lines (``t`` = epoch field,
``vs`` = value string), the Spark side runs the real sink
transformation, and the DuckDB oracle derives the expected *output*
directly from (t, vs) from first principles — it never re-runs the
translation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_scrape import _base, _base_sql, _s


def _omap_s(*entries):
    """map<string,string> from (cond, key, val) triples; cond None = always."""
    parts = []
    empty = F.expr("cast(map() as map<string,string>)")
    for cond, key, val in entries:
        m = F.create_map(F.lit(key), val)
        parts.append(m if cond is None else F.when(cond, m).otherwise(empty))
    return F.map_concat(*parts) if parts else empty


def _omap_l(*entries):
    parts = []
    empty = F.expr("cast(map() as map<string,bigint>)")
    for cond, key, val in entries:
        m = F.create_map(F.lit(key), val.cast("long"))
        parts.append(m if cond is None else F.when(cond, m).otherwise(empty))
    return F.map_concat(*parts) if parts else empty


# ---------------------------------------------------------------------------
# azuremonitor exporter (sinks/azuremonitor.py)
# ---------------------------------------------------------------------------

def q_azure(spark, sf_dir, tok_dir) -> DataFrame:
    """Azure Monitor envelope battery: all 7 span kinds x 5 span types
    (http/rpc/db/messaging/unknown, faas rows dropped), the 4-branch
    URL preference chains incl. a port-0 fallback-to-http.url row, the
    request-db no-copy quirk, RFC3339Nano fraction trimming, day-scale
    durations, enum-name status properties with decimal out-of-range,
    resource/lib property overlays, and 1024-char name truncation."""
    from .sinks.azuremonitor import azure_envelopes
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    kinds = ["server", "consumer", "client", "producer", "internal",
             "unspecified", ""]
    ty = t % 5
    u = t % 4
    name = F.when(t % 97 == 0, F.expr("repeat('x', 1030)")) \
        .otherwise(F.concat(F.lit("nm"), _s(t % 10)))
    attrs = F.map_concat(
        # http
        _omap_s((ty == 0, "http.method", F.lit("GET"))),
        _omap_s(((ty == 0) & (t % 3 == 0), "http.route",
                 F.concat(F.lit("r"), _s(t % 4)))),
        _omap_s(((ty == 0) & (t % 3 == 1), "http.route",
                 F.concat(F.lit("/s"), _s(t % 4)))),
        _omap_s(((ty == 0) & (u == 0), "http.scheme", F.lit("http")),
                ((ty == 0) & (u == 0), "http.host",
                 F.concat(F.lit("h"), _s(t % 5))),
                ((ty == 0) & (u == 0), "http.target",
                 F.concat(F.lit("tg"), _s(t % 7)))),
        _omap_s(((ty == 0) & (u == 1), "http.scheme", F.lit("https")),
                ((ty == 0) & (u == 1), "http.server_name", F.lit("sn")),
                ((ty == 0) & (u == 1), "http.target",
                 F.concat(F.lit("/tp"), _s(t % 7))),
                ((ty == 0) & (u == 1), "http.url",
                 F.lit("http://fb.example/z"))),
        _omap_s(((ty == 0) & (u == 2), "http.scheme", F.lit("https")),
                ((ty == 0) & (u == 2), "net.host.name", F.lit("nh")),
                ((ty == 0) & (u == 2), "http.target", F.lit("/tq"))),
        _omap_s(((ty == 0) & (u == 3), "http.url",
                 F.concat(F.lit("http://hh"), _s(t % 5), F.lit(":81/p"),
                          _s(t % 9)))),
        _omap_s(((ty == 0) & (t % 6 == 0), "http.client_ip",
                 F.lit("9.9.9.9"))),
        _omap_s(((ty == 0) & (t % 2 == 0), "net.peer.ip",
                 F.lit("1.2.3.4"))),
        # rpc
        _omap_s((ty == 1, "rpc.system", F.lit("grpc"))),
        _omap_s(((ty == 1) & (t % 2 == 0), "net.peer.name",
                 F.concat(F.lit("pn"), _s(t % 3)))),
        _omap_s((ty == 1, "net.peer.ip",
                 F.concat(F.lit("10.0.0."), _s(t % 9)))),
        # db
        _omap_s((ty == 2, "db.system", F.lit("mysql"))),
        _omap_s(((ty == 2) & (t % 2 == 0), "db.statement",
                 F.concat(F.lit("SELECT "), _s(t % 7)))),
        _omap_s(((ty == 2) & (t % 4 >= 2), "db.operation",
                 F.concat(F.lit("op"), _s(t % 3)))),
        _omap_s(((ty == 2) & (t % 3 != 2), "net.peer.ip",
                 F.lit("10.1.1.1"))),
        # messaging
        _omap_s((ty == 3, "messaging.system", F.lit("kafka"))),
        _omap_s(((ty == 3) & (t % 2 == 0), "messaging.url",
                 F.concat(F.lit("amqp://q"), _s(t % 3)))),
        _omap_s(((ty == 3) & (t % 3 == 0), "net.peer.name", F.lit("mq"))),
        # unknown / faas
        _omap_s(((ty == 4) & (t % 13 == 0), "faas.trigger", F.lit("http"))),
        _omap_s(((ty == 4) & (t % 13 != 0), "k1", F.col("vs"))))
    attrs_int = F.map_concat(
        _omap_l(((ty == 0) & (t % 2 == 0), "http.status_code",
                 100 + t % 400)),
        _omap_l(((ty == 0) & (u == 1), "net.host.port", t % 1000)),
        _omap_l(((ty == 0) & (u == 2), "net.host.port", (t % 900) + 1)),
        _omap_l((ty == 1, "rpc.grpc.status_code", t % 17)),
        _omap_l((ty == 1, "net.peer.port", t % 100)),
        _omap_l((ty == 2, "net.peer.port", t % 90)),
        _omap_l(((ty == 3) & (t % 4 < 2), "net.peer.port", F.lit(5672))),
        _omap_l((t % 7 == 3, "mi", t % 50)))
    attrs_double = F.when(
        t % 3 == 0,
        F.create_map(F.lit("md"), ((t % 9) + 0.5).cast("double"))) \
        .otherwise(F.expr("cast(map() as map<string,double>)"))
    attrs_bool = F.when(
        t % 5 == 1, F.create_map(F.lit("flag"), t % 2 == 0)) \
        .otherwise(F.expr("cast(map() as map<string,boolean>)"))
    resource = F.map_concat(
        _omap_s((None, "rk", F.concat(F.lit("rv"), _s(t % 5)))),
        _omap_s(((t % 2 == 0), "service.name",
                 F.concat(F.lit("svc"), _s(t % 3)))),
        _omap_s(((t % 4 == 0), "service.namespace", F.lit("ns"))),
        _omap_s(((t % 3 == 0), "service.instance.id",
                 F.concat(F.lit("inst"), _s(t % 2)))))
    start_ns = (t * 1_000_000_000 + (t % 1000) * 1_000_000).cast("long")
    dur_ns = ((((t % 3) * 24 + t % 24) * 3600_000_000
               + (t % 60) * 60_000_000 + (t % 61) * 1_000_000
               + t % 1_000_000) * 1000 + t % 1000).cast("long")
    spans = b.select(
        h.alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.when(t % 3 != 0, F.substring(h, 17, 16)).alias("parent_span_id"),
        name.alias("name"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]),
                     (t % 7 + 1).cast("int")).alias("kind"),
        start_ns.alias("start_ns"),
        (start_ns + dur_ns).alias("end_ns"),
        (t % 4).cast("int").alias("status_code"),
        (t % 3).cast("int").alias("deprecated_code"),
        F.when(t % 5 == 0, F.concat(F.lit("m"), _s(t % 2)))
        .otherwise(F.lit("")).alias("status_message"),
        attrs.alias("attrs"), attrs_int.alias("attrs_int"),
        attrs_double.alias("attrs_double"), attrs_bool.alias("attrs_bool"),
        resource.alias("resource"),
        F.when(t % 6 != 0, F.lit("il")).otherwise(F.lit(""))
        .alias("lib_name"),
        F.when(t % 6 >= 2, F.lit("1.2")).otherwise(F.lit(""))
        .alias("lib_version"))
    # Codegen-stage break (test-fixture-only): without it the span
    # synthesis above FUSES into azure_envelopes' staged projections and
    # the single processNext() blows the JVM 64 KB method limit ("ERROR
    # CodeGenerator … Code grows beyond 64 KB" → interpreted fallback).
    # Each side compiles fine alone; production inputs arrive from a
    # scan, so the operator never sees this shape outside the gate.
    spans = spans.repartition(spark.sparkContext.defaultParallelism)
    return azure_envelopes(spans)


def _azure_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format
    name = f"CASE WHEN t%97=0 THEN repeat('x', 1030) ELSE 'nm' || {c('t%10')} END"
    # route: t%3=0 -> 'r'||t%4 (prefixed to '/r'||t%4 on requests),
    # t%3=1 -> '/s'||t%4, else absent
    req_name = f"""CASE
  WHEN ty=0 THEN 'GET ' || CASE WHEN t%3=0 THEN '/r' || {c('t%4')}
                                WHEN t%3=1 THEN '/s' || {c('t%4')}
                                ELSE {name} END
  WHEN ty=1 THEN 'grpc ' || {name}
  ELSE {name} END"""
    dep_name = f"""CASE
  WHEN ty=0 THEN 'GET' || CASE WHEN t%3=0 THEN ' r' || {c('t%4')}
                               WHEN t%3=1 THEN ' /s' || {c('t%4')}
                               ELSE '' END
  ELSE {name} END"""
    item_name = f"CASE WHEN is_req THEN {req_name} ELSE {dep_name} END"
    peer_rpc = (f"(CASE WHEN t%2=0 THEN 'pn' || {c('t%3')} "
                f"ELSE '10.0.0.' || {c('t%9')} END)"
                f" || (CASE WHEN t%100<>0 THEN ':' || {c('t%100')} "
                "ELSE '' END)")
    peer_db = (f"(CASE WHEN t%3<>2 THEN '10.1.1.1' ELSE '' END)"
               f" || (CASE WHEN t%90<>0 THEN ':' || {c('t%90')} "
               "ELSE '' END)")
    peer_msg = ("(CASE WHEN t%3=0 THEN 'mq' ELSE '' END)"
                " || (CASE WHEN t%4<2 THEN ':5672' ELSE '' END)")
    req_url = f"""CASE
  WHEN ty=0 AND u=0 THEN 'http://h' || {c('t%5')} || '/tg' || {c('t%7')}
  WHEN ty=0 AND u=1 THEN CASE WHEN t%1000<>0
       THEN 'https://sn:' || {c('t%1000')} || '/tp' || {c('t%7')}
       ELSE 'http://fb.example/z' END
  WHEN ty=0 AND u=2 THEN 'https://nh:' || {c('(t%900)+1')} || '/tq'
  WHEN ty=0 AND u=3 THEN 'http://hh' || {c('t%5')} || ':81/p' || {c('t%9')}
  WHEN ty=1 THEN substr({req_name}, 1, 2048)
  ELSE '' END"""
    req_source = f"""CASE
  WHEN ty=0 THEN CASE WHEN t%6=0 THEN '9.9.9.9'
                      WHEN t%2=0 THEN '1.2.3.4' ELSE '' END
  WHEN ty=1 THEN {peer_rpc}
  WHEN ty=3 THEN CASE WHEN t%2=0 THEN 'amqp://q' || {c('t%3')}
                      ELSE {peer_msg} END
  ELSE '' END"""
    dep_type = f"""CASE
  WHEN t%7 IN (4,5,6) THEN 'InProc'
  WHEN ty=0 THEN 'HTTP' WHEN ty=1 THEN 'grpc'
  WHEN ty=2 THEN 'mysql' WHEN ty=3 THEN 'kafka' ELSE '' END"""
    dep_data = f"""CASE
  WHEN ty=0 AND u IN (1,3) THEN CASE WHEN u=1 THEN 'http://fb.example/z'
       ELSE 'http://hh' || {c('t%5')} || ':81/p' || {c('t%9')} END
  WHEN ty=0 AND u=0 THEN 'http://h' || {c('t%5')} || '/tg' || {c('t%7')}
  WHEN ty=1 THEN substr({name}, 1, 8192)
  WHEN ty=2 THEN CASE WHEN t%2=0 THEN 'SELECT ' || {c('t%7')}
                      WHEN t%4>=2 THEN 'op' || {c('t%3')} ELSE '' END
  WHEN ty=3 AND t%2=0 THEN 'amqp://q' || {c('t%3')}
  ELSE '' END"""
    dep_target = f"""CASE
  WHEN ty=0 AND u=1 THEN 'fb.example'
  WHEN ty=0 AND u=3 THEN 'hh' || {c('t%5')} || ':81'
  WHEN ty=0 AND u=0 THEN 'h' || {c('t%5')}
  WHEN ty=1 THEN {peer_rpc}
  WHEN ty=2 THEN {peer_db}
  WHEN ty=3 THEN CASE WHEN t%2=0 THEN 'amqp://q' || {c('t%3')}
                      ELSE {peer_msg} END
  ELSE '' END"""
    eff = "CASE WHEN t%4=0 AND t%3<>0 THEN 2 ELSE t%4 END"
    response = f"""CASE
  WHEN ty=0 AND t%2=0 THEN {c('100 + t%400')}
  WHEN ty=1 THEN CASE WHEN t%17<>0 THEN {c('t%17')} ELSE {c('t%3')} END
  ELSE {c(eff)} END"""
    success = f"""CASE
  WHEN ty=0 AND t%2=0 THEN CASE WHEN 100 + t%400 <= 399 THEN 1 ELSE 0 END
  ELSE CASE WHEN ({eff})=2 THEN 0 ELSE 1 END END"""
    time_rfc = ("strftime(make_timestamp(t*1000000), '%Y-%m-%dT%H:%M:%S')"
                " || CASE WHEN t%1000>0"
                " THEN '.' || rtrim(printf('%03d', t%1000), '0')"
                " ELSE '' END || 'Z'")
    dur_us = ("(((t%3)*24 + t%24)*3600000000 + (t%60)*60000000"
              " + (t%61)*1000000 + t%1000000)")
    duration = (f"printf('%02d.%02d:%02d:%02d.%06d', {dur_us}//86400000000,"
                f" ({dur_us}%86400000000)//3600000000,"
                f" ({dur_us}%3600000000)//60000000,"
                f" ({dur_us}%60000000)//1000000, {dur_us}%1000000)")
    copied = "NOT (is_req AND ty=2)"
    dd = "CAST(CAST({} AS DOUBLE) AS VARCHAR)".format
    props = f"""array_to_string(list_sort(list_filter([
  CASE WHEN {copied} AND ty=0 THEN 'http.method=GET' END,
  CASE WHEN {copied} AND ty=0 AND t%3=0 THEN 'http.route=r' || {c('t%4')}
       WHEN {copied} AND ty=0 AND t%3=1 THEN 'http.route=/s' || {c('t%4')} END,
  CASE WHEN {copied} AND ty=0 AND u=0 THEN 'http.scheme=http'
       WHEN {copied} AND ty=0 AND u IN (1,2) THEN 'http.scheme=https' END,
  CASE WHEN {copied} AND ty=0 AND u=0 THEN 'http.host=h' || {c('t%5')} END,
  CASE WHEN {copied} AND ty=0 AND u=1 THEN 'http.server_name=sn' END,
  CASE WHEN {copied} AND ty=0 AND u=0 THEN 'http.target=tg' || {c('t%7')}
       WHEN {copied} AND ty=0 AND u=1 THEN 'http.target=/tp' || {c('t%7')}
       WHEN {copied} AND ty=0 AND u=2 THEN 'http.target=/tq' END,
  CASE WHEN {copied} AND ty=0 AND u=1 THEN 'http.url=http://fb.example/z'
       WHEN {copied} AND ty=0 AND u=3
       THEN 'http.url=http://hh' || {c('t%5')} || ':81/p' || {c('t%9')} END,
  CASE WHEN {copied} AND ty=0 AND u=2 THEN 'net.host.name=nh' END,
  CASE WHEN {copied} AND ty=0 AND t%6=0 THEN 'http.client_ip=9.9.9.9' END,
  CASE WHEN {copied} AND ty=0 AND t%2=0 THEN 'net.peer.ip=1.2.3.4'
       WHEN {copied} AND ty=1 THEN 'net.peer.ip=10.0.0.' || {c('t%9')}
       WHEN {copied} AND ty=2 AND t%3<>2 THEN 'net.peer.ip=10.1.1.1' END,
  CASE WHEN {copied} AND ty=1 THEN 'rpc.system=grpc' END,
  CASE WHEN {copied} AND ty=1 AND t%2=0
       THEN 'net.peer.name=pn' || {c('t%3')}
       WHEN {copied} AND ty=3 AND t%3=0 THEN 'net.peer.name=mq' END,
  CASE WHEN {copied} AND ty=2 THEN 'db.system=mysql' END,
  CASE WHEN {copied} AND ty=2 AND t%2=0
       THEN 'db.statement=SELECT ' || {c('t%7')} END,
  CASE WHEN {copied} AND ty=2 AND t%4>=2
       THEN 'db.operation=op' || {c('t%3')} END,
  CASE WHEN {copied} AND ty=3 THEN 'messaging.system=kafka' END,
  CASE WHEN {copied} AND ty=3 AND t%2=0
       THEN 'messaging.url=amqp://q' || {c('t%3')} END,
  CASE WHEN {copied} AND ty=4 THEN 'k1=' || vs END,
  CASE WHEN {copied} AND t%5=1
       THEN 'flag=' || CASE WHEN t%2=0 THEN 'true' ELSE 'false' END END,
  'otel.status_code=' || CASE t%4 WHEN 0 THEN 'STATUS_CODE_UNSET'
       WHEN 1 THEN 'STATUS_CODE_OK' WHEN 2 THEN 'STATUS_CODE_ERROR'
       ELSE {c('t%4')} END,
  'otel.status_deprecatedcode=' || CASE t%3
       WHEN 0 THEN 'DEPRECATED_STATUS_CODE_OK'
       WHEN 1 THEN 'DEPRECATED_STATUS_CODE_CANCELLED'
       ELSE 'DEPRECATED_STATUS_CODE_UNKNOWN_ERROR' END,
  CASE WHEN t%5=0 THEN 'otel.status_description=m' || {c('t%2')} END,
  'rk=rv' || {c('t%5')},
  CASE WHEN t%2=0 THEN 'service.name=svc' || {c('t%3')} END,
  CASE WHEN t%4=0 THEN 'service.namespace=ns' END,
  CASE WHEN t%3=0 THEN 'service.instance.id=inst' || {c('t%2')} END,
  CASE WHEN t%6<>0 THEN 'instrumentationlibrary.name=il' END,
  CASE WHEN t%6>=2 THEN 'instrumentationlibrary.version=1.2' END
], x -> x IS NOT NULL)), ',')"""
    meas = f"""array_to_string(list_sort(list_filter([
  CASE WHEN {copied} AND ty=0 AND t%2=0
       THEN 'http.status_code=' || {dd('100 + t%400')} END,
  CASE WHEN {copied} AND ty=0 AND u=1
       THEN 'net.host.port=' || {dd('t%1000')}
       WHEN {copied} AND ty=0 AND u=2
       THEN 'net.host.port=' || {dd('(t%900)+1')} END,
  CASE WHEN {copied} AND ty=1
       THEN 'rpc.grpc.status_code=' || {dd('t%17')} END,
  CASE WHEN {copied} AND ty=1 THEN 'net.peer.port=' || {dd('t%100')}
       WHEN {copied} AND ty=2 THEN 'net.peer.port=' || {dd('t%90')}
       WHEN {copied} AND ty=3 AND t%4<2
       THEN 'net.peer.port=' || {dd('5672')} END,
  CASE WHEN {copied} AND t%7=3 THEN 'mi=' || {dd('t%50')} END,
  CASE WHEN {copied} AND t%3=0 THEN 'md=' || {dd('(t%9)+0.5')} END
], x -> x IS NOT NULL)), ',')"""
    # an all-NULL filtered list stringifies to NULL in DuckDB, but the
    # Spark side serializes an empty map to ''
    meas = f"COALESCE({meas}, '')"
    return f"""WITH {{base}},
spans AS (
  SELECT t, vs, scrape_id, t%5 AS ty, t%4 AS u,
         t%7 IN (0,1) AS is_req
  FROM base
  WHERE NOT (t%5=4 AND t%13=0)
)
SELECT CASE WHEN is_req THEN 'Microsoft.ApplicationInsights.Request'
       ELSE 'Microsoft.ApplicationInsights.RemoteDependency' END
           AS envelope_name,
       {time_rfc} AS time_rfc3339,
       md5(scrape_id) AS operation_id,
       CASE WHEN t%3<>0 THEN substr(md5(scrape_id), 17, 16)
            ELSE '' END AS operation_parent_id,
       CASE WHEN is_req THEN substr({req_name}, 1, 1024) END
           AS operation_name,
       CASE WHEN t%2=0 THEN
         CASE WHEN t%4=0 THEN 'ns.svc' || {c('t%3')}
              ELSE 'svc' || {c('t%3')} END END AS cloud_role,
       CASE WHEN t%3=0 THEN 'inst' || {c('t%2')} END AS cloud_role_instance,
       CASE WHEN is_req THEN 'RequestData'
            ELSE 'RemoteDependencyData' END AS base_type,
       substr(md5(scrape_id), 1, 16) AS item_id,
       substr({item_name}, 1, 1024) AS item_name,
       {duration} AS duration,
       substr({response}, 1, 1024) AS response_code,
       CAST({success} AS INT) AS success,
       CASE WHEN is_req THEN substr({req_url}, 1, 2048) END AS url,
       CASE WHEN is_req THEN substr({req_source}, 1, 1024) END AS source,
       CASE WHEN NOT is_req THEN substr({dep_type}, 1, 1024) END
           AS dep_type,
       CASE WHEN NOT is_req THEN substr({dep_data}, 1, 8192) END
           AS dep_data,
       CASE WHEN NOT is_req THEN substr({dep_target}, 1, 1024) END
           AS dep_target,
       {props} AS props_s,
       {meas} AS meas_s
FROM spans"""


# ---------------------------------------------------------------------------
# splunkhec exporter (sinks/splunkhec.py)
# ---------------------------------------------------------------------------

_EMPTY_S = "cast(map() as map<string,string>)"


def _hec_ts(t):
    """0 when t%31==0 (time-omitted rule), else ns with a .4999/.5 ms
    boundary to exercise the round-half-away millisecond rounding."""
    return F.when(t % 31 == 0, F.lit(0)).otherwise(
        t * 1_000_000_000 + (t % 999) * 1_000_000
        + F.when(t % 2 == 0, F.lit(499_999)).otherwise(F.lit(500_000))) \
        .cast("long")


_HEC_TS_SQL = ("CASE WHEN t%31=0 THEN CAST(0 AS BIGINT) "
               "ELSE t*1000000000 + (t%999)*1000000 "
               "+ CASE WHEN t%2=0 THEN 499999 ELSE 500000 END END")
# Go math.Round(float64(ns)/1e6)/1e3 — same IEEE division + half-away
# rounding in DuckDB, so knife-edge ms boundaries resolve identically
_HEC_TIME_SQL = (f"CASE WHEN t%31=0 THEN CAST(NULL AS DOUBLE) ELSE "
                 f"round(CAST({_HEC_TS_SQL} AS DOUBLE)/1000000.0)/1000.0 END")


def q_hec_logs(spark, sf_dir, tok_dir) -> DataFrame:
    """HEC log-event mapping: the four envelope attrs routed out of
    fields, typed field rendering, zero-ts time omission, ms rounding."""
    from .sinks.splunkhec import hec_log_events
    b = _base(spark, tok_dir)
    t = F.col("t")
    attrs = F.map_concat(
        _omap_s(((t % 2 == 0), "host.name", F.concat(F.lit("hn"), _s(t % 3)))),
        _omap_s(((t % 3 == 0), "service.name",
                 F.concat(F.lit("sv"), _s(t % 2)))),
        _omap_s(((t % 5 == 0), "com.splunk.sourcetype", F.lit("st"))),
        _omap_s(((t % 7 == 0), "com.splunk.index", F.lit("ix"))),
        _omap_s((None, "k1", F.col("vs"))),
        _omap_s(((t % 3 == 1), "k2", F.concat(F.lit("x"), _s(t % 4)))))
    logs = b.select(
        _hec_ts(t).alias("ts_ns"),
        F.concat(F.lit("log "), F.col("vs")).alias("body"),
        attrs.alias("attrs"),
        F.when(t % 2 == 0, F.create_map(F.lit("ni"),
                                        (t % 100 - 7).cast("long")))
        .otherwise(F.expr("cast(map() as map<string,bigint>)"))
        .alias("attrs_int"),
        F.when(t % 3 == 2, F.create_map(F.lit("nb"), t % 4 < 2))
        .otherwise(F.expr("cast(map() as map<string,boolean>)"))
        .alias("attrs_bool"))
    return hec_log_events(logs, source="cfg-src", sourcetype="cfg-st",
                          index="cfg-ix")


def _hec_logs_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format
    fields = f"""array_to_string(list_sort(list_filter([
  'k1=' || vs,
  CASE WHEN t%3=1 THEN 'k2=x' || {c('t%4')} END,
  CASE WHEN t%3=2 THEN 'nb=' || CASE WHEN t%4<2 THEN 'true' ELSE 'false' END END,
  CASE WHEN t%2=0 THEN 'ni=' || {c('t%100 - 7')} END
], x -> x IS NOT NULL)), ',')"""
    return f"""WITH {{base}}
SELECT {_HEC_TIME_SQL} AS time,
       CASE WHEN t%2=0 THEN 'hn' || {c('t%3')} ELSE 'unknown' END AS host,
       CASE WHEN t%3=0 THEN 'sv' || {c('t%2')} ELSE 'cfg-src' END AS source,
       CASE WHEN t%5=0 THEN 'st' ELSE 'cfg-st' END AS sourcetype,
       CASE WHEN t%7=0 THEN 'ix' ELSE 'cfg-ix' END AS "index",
       'log ' || vs AS event,
       {fields} AS fields_s
FROM base"""


def q_hec_metrics(spark, sf_dir, tok_dir) -> DataFrame:
    """HEC metric-event mapping: metric_name:<name> fields, cumulative
    histogram buckets with %g-formatted le + +Inf overflow, the
    counts-length bucket-skip rule, labels overlaying resource."""
    from .sinks.splunkhec import hec_metric_events
    b = _base(spark, tok_dir)
    t = F.col("t")
    mtypes = ["int_gauge", "double_gauge", "int_sum", "double_sum",
              "histogram"]
    nb = (t % 3 + 1).cast("int")
    ladder = F.array(F.lit(0.5), F.lit(2.0), F.lit(7.5))
    cbase = F.array(*[(t % m).cast("long") for m in (5, 7, 11, 13)])
    resource = F.map_concat(
        _omap_s(((t % 2 == 0), "host.name", F.concat(F.lit("hn"), _s(t % 3)))),
        _omap_s(((t % 3 == 0), "service.name", F.lit("sv"))),
        _omap_s(((t % 5 == 0), "com.splunk.sourcetype", F.lit("st"))),
        _omap_s(((t % 7 == 0), "com.splunk.index", F.lit("ix"))),
        _omap_s((None, "ra", F.concat(F.lit("v"), _s(t % 5)))))
    labels = F.map_concat(
        _omap_s((None, "l1", F.concat(F.lit("a"), _s(t % 3)))),
        _omap_s(((t % 2 == 1), "l2", F.col("vs"))))
    points = b.select(
        F.concat(F.lit("m"), _s(t % 7)).alias("name"),
        F.element_at(F.array(*[F.lit(m) for m in mtypes]),
                     (t % 5 + 1).cast("int")).alias("mtype"),
        _hec_ts(t).alias("ts_ns"),
        (t % 1000 - 13).cast("long").alias("ival"),
        ((t % 97).cast("double") / 4.0).alias("dval"),
        ((t % 50).cast("double") / 2.0).alias("hsum"),
        (t % 100).cast("long").alias("hcount"),
        F.slice(ladder, 1, nb).alias("bounds"),
        F.when(t % 17 == 0, F.expr("cast(array() as array<bigint>)"))
        .otherwise(F.slice(cbase, 1, nb + 1)).alias("counts"),
        labels.alias("labels"), resource.alias("resource"))
    return hec_metric_events(points, source="cfg-src", sourcetype="cfg-st",
                             index="cfg-ix")


def _hec_metrics_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format
    dd = "CAST(CAST({} AS DOUBLE) AS VARCHAR)".format
    env = f"""{_HEC_TIME_SQL} AS time,
       CASE WHEN t%2=0 THEN 'hn' || {c('t%3')} ELSE 'unknown' END AS host,
       CASE WHEN t%3=0 THEN 'sv' ELSE 'cfg-src' END AS source,
       CASE WHEN t%5=0 THEN 'st' ELSE 'cfg-st' END AS sourcetype,
       CASE WHEN t%7=0 THEN 'ix' ELSE 'cfg-ix' END AS "index",
       'metric' AS event"""
    # sorted field serialization: com.splunk.* < host.name < l1 < l2
    # < le < metric_name:* < ra < service.name
    common = f"""CASE WHEN t%7=0 THEN 'com.splunk.index=ix,' ELSE '' END
 || CASE WHEN t%5=0 THEN 'com.splunk.sourcetype=st,' ELSE '' END
 || CASE WHEN t%2=0 THEN 'host.name=hn' || {c('t%3')} || ',' ELSE '' END
 || 'l1=a' || {c('t%3')} || ','
 || CASE WHEN t%2=1 THEN 'l2=' || vs || ',' ELSE '' END"""
    tail = f"""',ra=v' || {c('t%5')}
 || CASE WHEN t%3=0 THEN ',service.name=sv' ELSE '' END"""
    mname = f"'m' || {c('t%7')}"
    sval = f"""CASE
  WHEN t%5 IN (0,2) THEN {c('t%1000 - 13')}
  ELSE {dd('CAST(t%97 AS DOUBLE)/4.0')} END"""
    # histogram pieces: nb = t%3+1 bounds from [0.5, 2, 7.5] (%g drops
    # the 2.0 -> '2'); counts c1..c4 = t%5,t%7,t%11,t%13
    les = ["'0.5'", "'2'", "'7.5'"]
    cum = ["t%5", "(t%5)+(t%7)", "(t%5)+(t%7)+(t%11)"]
    inf_v = ("CASE t%3 WHEN 0 THEN (t%5)+(t%7) "
             "WHEN 1 THEN (t%5)+(t%7)+(t%11) "
             "ELSE (t%5)+(t%7)+(t%11)+(t%13) END")
    bucket_rows = "\nUNION ALL\n".join(
        f"""SELECT {env},
       {common} || 'le=' || {les[i]} || ',metric_name:' || {mname}
       || '_bucket=' || {c(cum[i])} || {tail} AS fields_s
FROM base WHERE t%5=4 AND t%17<>0 AND t%3+1 > {i}""" for i in range(3))
    return f"""WITH {{base}}
SELECT {env},
       {common} || 'metric_name:' || {mname} || '=' || {sval} || {tail}
           AS fields_s
FROM base WHERE t%5 <> 4
UNION ALL
SELECT {env},
       {common} || 'metric_name:' || {mname} || '_sum='
       || {dd('CAST(t%50 AS DOUBLE)/2.0')} || {tail} AS fields_s
FROM base WHERE t%5 = 4
UNION ALL
SELECT {env},
       {common} || 'metric_name:' || {mname} || '_count='
       || {c('t%100')} || {tail} AS fields_s
FROM base WHERE t%5 = 4
UNION ALL
{bucket_rows}
UNION ALL
SELECT {env},
       {common} || 'le=+Inf,metric_name:' || {mname}
       || '_bucket=' || {c(inf_v)} || {tail} AS fields_s
FROM base WHERE t%5=4 AND t%17<>0"""


def q_hec_spans(spark, sf_dir, tok_dir) -> DataFrame:
    """HEC span events: HecSpan flattening — enum-name kind/status,
    empty-id parent rendering, in-order events/links payloads,
    resource attrs as the Fields map."""
    from .sinks.splunkhec import hec_span_events
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    kinds = ["unspecified", "internal", "server", "client", "producer",
             "consumer"]
    ts = _hec_ts(t)
    ev = lambda n, off, a: F.struct(
        F.lit(n).alias("name"), (ts + off).cast("long").alias("ts_ns"),
        F.lit(a).alias("attrs_s"))
    events = (F.when(t % 2 == 0, F.array(ev("e1", 5, "x=1"), ev("e2", 9, "")))
              .when(t % 5 == 1, F.array(ev("e3", 7, "z=3")))
              .otherwise(F.filter(F.array(ev("e1", 5, "x=1")),
                                  lambda s: F.lit(False))))
    lk = F.struct(F.md5(F.concat(F.col("scrape_id"), F.lit("L")))
                  .alias("trace_id"),
                  F.substring(F.md5(F.concat(F.col("scrape_id"), F.lit("L"))),
                              1, 16).alias("span_id"),
                  F.lit("st").alias("state"), F.lit("y=2").alias("attrs_s"))
    links = F.when(t % 4 == 0, F.array(lk)) \
        .otherwise(F.filter(F.array(lk), lambda s: F.lit(False)))
    spans = b.select(
        h.alias("trace_id"), F.substring(h, 1, 16).alias("span_id"),
        F.when(t % 3 != 0, F.substring(h, 17, 16)).alias("parent_span_id"),
        F.concat(F.lit("sp"), _s(t % 5)).alias("name"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]),
                     (t % 6 + 1).cast("int")).alias("kind"),
        ts.alias("start_ns"), (ts + 1_000_000).cast("long").alias("end_ns"),
        (t % 4).cast("int").alias("status_code"),
        F.when(t % 2 == 0, F.concat(F.lit("sm"), _s(t % 3)))
        .otherwise(F.lit("")).alias("status_message"),
        F.create_map(F.lit("a1"), F.col("vs"),
                     F.lit("a2"), F.concat(F.lit("b"), _s(t % 3)))
        .alias("attrs"),
        F.map_concat(
            _omap_s(((t % 3 == 0), "host.name",
                     F.concat(F.lit("h"), _s(t % 2)))),
            _omap_s(((t % 4 == 0), "service.name", F.lit("s"))),
            _omap_s((None, "rr", F.concat(F.lit("q"), _s(t % 3)))))
        .alias("resource"),
        events.alias("events"), links.alias("links"))
    return hec_span_events(spans, source="cfg-src", sourcetype="cfg-st",
                           index="cfg-ix")


def _hec_spans_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format
    ts = _HEC_TS_SQL
    ev = (f"CASE WHEN t%2=0 THEN 'e1@' || CAST(({ts})+5 AS VARCHAR)"
          f" || '{{x=1}}|e2@' || CAST(({ts})+9 AS VARCHAR) || '{{}}'"
          f" WHEN t%5=1 THEN 'e3@' || CAST(({ts})+7 AS VARCHAR)"
          f" || '{{z=3}}' ELSE '' END")
    lk = ("CASE WHEN t%4=0 THEN md5(scrape_id || 'L') || '/'"
          " || substr(md5(scrape_id || 'L'), 1, 16) || '/st{y=2}'"
          " ELSE '' END")
    fields = (f"CASE WHEN t%3=0 THEN 'host.name=h' || {c('t%2')} || ',' "
              "ELSE '' END || 'rr=q' || " + c("t%3")
              + " || CASE WHEN t%4=0 THEN ',service.name=s' ELSE '' END")
    return f"""WITH {{base}}
SELECT {_HEC_TIME_SQL} AS time,
       CASE WHEN t%3=0 THEN 'h' || {c('t%2')} ELSE 'unknown' END AS host,
       CASE WHEN t%4=0 THEN 's' ELSE 'cfg-src' END AS source,
       'cfg-st' AS sourcetype, 'cfg-ix' AS "index",
       {fields} AS fields_s,
       md5(scrape_id) AS trace_id,
       substr(md5(scrape_id), 1, 16) AS span_id,
       CASE WHEN t%3<>0 THEN substr(md5(scrape_id), 17, 16)
            ELSE '' END AS parent_span,
       'sp' || {c('t%5')} AS name,
       CASE t%6 WHEN 0 THEN 'SPAN_KIND_UNSPECIFIED'
                WHEN 1 THEN 'SPAN_KIND_INTERNAL'
                WHEN 2 THEN 'SPAN_KIND_SERVER'
                WHEN 3 THEN 'SPAN_KIND_CLIENT'
                WHEN 4 THEN 'SPAN_KIND_PRODUCER'
                ELSE 'SPAN_KIND_CONSUMER' END AS kind_s,
       CASE t%4 WHEN 0 THEN 'STATUS_CODE_UNSET'
                WHEN 1 THEN 'STATUS_CODE_OK'
                WHEN 2 THEN 'STATUS_CODE_ERROR'
                ELSE {c('t%4')} END AS status_code_s,
       CASE WHEN t%2=0 THEN 'sm' || {c('t%3')} ELSE '' END
           AS status_message,
       {ts} AS start_ns,
       ({ts}) + 1000000 AS end_ns,
       'a1=' || vs || ',a2=b' || {c('t%3')} AS attrs_s,
       {ev} AS events_s,
       {lk} AS links_s
FROM base"""


# ---------------------------------------------------------------------------
# datadog exporter (sinks/datadog.py)
# ---------------------------------------------------------------------------

def q_datadog(spark, sf_dir, tok_dir) -> DataFrame:
    """Datadog APM span battery: the 7-step hostname chain incl. the
    aws direct-return quirk, service precedence (resource / empty→cfg /
    span-attr override), normalized il-based span names, the resource
    name precedence chain, version-tag fallback, error rules (status,
    5xx, client-4xx, unparseable status code), container tags,
    analytics.event metrics, and low-8-byte uint64 APM ids."""
    from .sinks.datadog import datadog_spans
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    hp = F.md5(F.concat(F.col("scrape_id"), F.lit("P")))
    m13 = t % 13
    resource = F.map_concat(
        _omap_s(((t % 3 == 0), "service.name",
                 F.concat(F.lit("svc"), _s(t % 4)))),
        _omap_s(((t % 3 == 1), "service.name", F.lit(""))),
        _omap_s(((t % 4 == 0), "deployment.environment",
                 F.concat(F.lit("prod"), _s(t % 2)))),
        _omap_s(((m13 == 0), "datadog.host.name", F.lit("ddh"))),
        _omap_s(((m13 == 1), "k8s.node.name",
                 F.concat(F.lit("node"), _s(t % 2)))),
        _omap_s(((m13 == 1) & (t % 2 == 0), "k8s.cluster.name",
                 F.lit("cl"))),
        _omap_s(((m13 == 2), "container.id",
                 F.concat(F.lit("cont"), _s(t % 3)))),
        _omap_s((m13.isin(3, 4), "cloud.provider", F.lit("aws"))),
        _omap_s(((m13 == 3), "host.name", F.lit("ip-10-0-0-1"))),
        _omap_s(((m13 == 4), "host.name", F.lit("web1"))),
        _omap_s(((m13 == 6), "host.name",
                 F.concat(F.lit("hn"), _s(t % 3)))),
        _omap_s((m13.isin(3, 5), "host.id",
                 F.concat(F.lit("i-"), _s(t % 5)))),
        _omap_s(((t % 5 == 0), "service.version",
                 F.concat(F.lit("2."), _s(t % 2)))),
        _omap_s(((t % 5 == 1), "version", F.lit("0.1"))),
        _omap_s((None, "rt", F.concat(F.lit("rv"), _s(t % 7)))))
    attrs = F.map_concat(
        _omap_s(((t % 5 == 0), "http.method", F.lit("GET"))),
        _omap_s(((t % 5 == 0) & (t % 2 == 0), "http.route",
                 F.concat(F.lit("/api/"), _s(t % 3)))),
        _omap_s(((t % 5 == 0) & (t % 2 == 1) & (t % 3 == 0), "grpc.path",
                 F.lit("/pkg.Svc/M"))),
        _omap_s(((t % 5 == 1), "messaging.operation", F.lit("send"))),
        _omap_s(((t % 5 == 1) & (t % 3 == 0), "messaging.destination",
                 F.concat(F.lit("queue"), _s(t % 2)))),
        _omap_s(((t % 5 == 2), "rpc.method", F.lit("Call"))),
        _omap_s(((t % 5 == 2) & (t % 2 == 0), "rpc.service", F.lit("Sv"))),
        _omap_s(((t % 7 == 0), "http.status_code", F.lit("503"))),
        _omap_s(((t % 7 == 1), "http.status_code", F.lit("418"))),
        _omap_s(((t % 7 == 2), "http.status_code", F.lit("oops"))),
        _omap_s(((t % 11 == 0), "service.name", F.lit("ovr-svc"))),
        _omap_s(((t % 11 == 1), "span.type", F.lit("db"))),
        _omap_s(((t % 11 == 2), "analytics.event", F.lit("false"))),
        _omap_s(((t % 11 == 3), "analytics.event", F.lit("yes"))),
        _omap_s(((t % 11 == 4), "container.id", F.lit("spanc"))),
        _omap_s(((t % 9 == 0), "k8s.pod.name",
                 F.concat(F.lit("pp"), _s(t % 2)))),
        _omap_s(((t % 6 == 4), "otel.instrumentation_library.name",
                 F.lit("Old Lib"))),
        _omap_s((None, "sa", F.col("vs"))))
    kinds = ["unspecified", "internal", "server", "client", "producer",
             "consumer"]
    start = (t * 1_000_000_000 + t % 997).cast("long")
    spans = b.select(
        h.alias("trace_id"), F.substring(h, 1, 16).alias("span_id"),
        F.when(t % 17 == 0, F.lit("0" * 16))
        .when(t % 3 != 0, F.substring(hp, 1, 16)).alias("parent_span_id"),
        F.concat(F.lit("op-"), _s(t % 5)).alias("name"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]),
                     (t % 6 + 1).cast("int")).alias("kind"),
        start.alias("start_ns"),
        F.when(t % 29 == 0, F.lit(0).cast("long"))
        .otherwise(start + (t % 1000) * 1000 + 7).alias("end_ns"),
        (t % 3).cast("int").alias("status_code"),
        F.when(t % 2 == 0, F.lit("boom")).otherwise(F.lit(""))
        .alias("status_message"),
        F.when(t % 4 == 1, F.lit("cc=1")).otherwise(F.lit(""))
        .alias("trace_state"),
        attrs.alias("attrs"), resource.alias("resource"),
        F.when(t % 6 < 4, F.concat(F.lit("My-Lib"), _s(t % 2)))
        .otherwise(F.lit("")).alias("lib_name"),
        F.when(t % 6 < 4, F.lit("1.0")).otherwise(F.lit(""))
        .alias("lib_version"))
    # materialize the synthesized fixture before the operator: without
    # the cut, Catalyst inlines the ~40-branch map_concat trees into
    # every one of datadog_spans' 15 projections — a 21 MiB task
    # binary that OOMs an 8g driver at 32 concurrent tasks under
    # default confs (bare-session repro, round 5).  The operator under
    # test then runs over a real table, which is also the honest shape.
    spans = spans.localCheckpoint(eager=True)
    return datadog_spans(spans, cfg_env="none", cfg_service="cfg-svc",
                         cfg_version="9.9", cfg_hostname="otelcol")


def _datadog_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format
    udec = ("CAST(CAST('0x' || {} AS UBIGINT) AS VARCHAR)").format
    hostname = f"""CASE t%13
  WHEN 0 THEN 'ddh'
  WHEN 1 THEN 'node' || {c('t%2')}
       || CASE WHEN t%2=0 THEN '-cl' ELSE '' END
  WHEN 2 THEN 'cont' || {c('t%3')}
  WHEN 3 THEN 'i-' || {c('t%5')}
  WHEN 4 THEN 'web1'
  WHEN 5 THEN 'i-' || {c('t%5')}
  WHEN 6 THEN 'hn' || {c('t%3')}
  ELSE 'otelcol' END"""
    service = f"""CASE WHEN t%11=0 THEN 'ovr-svc'
  WHEN t%3=0 THEN 'svc' || {c('t%4')}
  WHEN t%3=1 THEN 'cfg-svc'
  ELSE 'OTLPResourceNoServiceName' END"""
    iln = (f"CASE WHEN t%6<4 THEN 'my_lib' || {c('t%2')} "
           "WHEN t%6=4 THEN 'old_lib' ELSE 'opentelemetry' END")
    kind_l = ("CASE t%6 WHEN 0 THEN 'unspecified' WHEN 1 THEN 'internal' "
              "WHEN 2 THEN 'server' WHEN 3 THEN 'client' "
              "WHEN 4 THEN 'producer' ELSE 'consumer' END")
    resource_name = f"""CASE
  WHEN t%5=0 THEN CASE WHEN t%2=0 THEN 'GET /api/' || {c('t%3')}
                       WHEN t%3=0 THEN 'GET /pkg.Svc/M'
                       ELSE 'GET' END
  WHEN t%5=1 THEN CASE WHEN t%3=0 THEN 'send queue' || {c('t%2')}
                       ELSE 'send' END
  WHEN t%5=2 THEN CASE WHEN t%2=0 THEN 'Call Sv' ELSE 'Call' END
  ELSE 'op-' || {c('t%5')} END"""
    dd_type = f"""CASE WHEN t%11=1 THEN 'db'
  WHEN t%6=3 THEN 'http' WHEN t%6=2 THEN 'web' ELSE 'custom' END"""
    error = ("CASE WHEN t%3=2 OR t%7=0 OR (t%7=1 AND t%6=3) "
             "THEN 1 ELSE 0 END")
    version = (f"CASE WHEN t%5=0 THEN '2.' || {c('t%2')} "
               "WHEN t%5=1 THEN '0.1' ELSE '9.9' END")
    cid = f"CASE WHEN t%11=4 THEN 'spanc' ELSE 'cont' || {c('t%3')} END"
    container = f"""CASE WHEN (t%13=2 OR t%11=4) AND t%9=0
       THEN 'container_id:' || {cid} || ',pod_name:pp' || {c('t%2')}
  WHEN t%13=2 OR t%11=4 THEN 'container_id:' || {cid}
  WHEN t%9=0 THEN 'pod_name:pp' || {c('t%2')}
  ELSE '' END"""
    meta = f"""array_to_string(list_sort(list_filter([
  '_dd.tags.container=' || {container},
  CASE WHEN t%13 IN (3,4) THEN 'cloud.provider=aws' END,
  CASE WHEN t%13=2 OR t%11=4 THEN 'container.id=' || {cid} END,
  CASE WHEN t%13=0 THEN 'datadog.host.name=ddh' END,
  CASE WHEN t%4=0 THEN 'deployment.environment=prod' || {c('t%2')} END,
  CASE WHEN t%3=2 THEN 'error.msg=' ||
       CASE WHEN t%2=0 THEN 'boom' ELSE 'ERR_CODE_2' END END,
  CASE WHEN t%3=2 THEN 'error.type=ERR_CODE_2' END,
  CASE WHEN t%5=0 AND t%2=1 AND t%3=0 THEN 'grpc.path=/pkg.Svc/M' END,
  CASE WHEN t%13 IN (3,5) THEN 'host.id=i-' || {c('t%5')} END,
  CASE WHEN t%13=3 THEN 'host.name=ip-10-0-0-1'
       WHEN t%13=4 THEN 'host.name=web1'
       WHEN t%13=6 THEN 'host.name=hn' || {c('t%3')} END,
  CASE WHEN t%5=0 THEN 'http.method=GET' END,
  CASE WHEN t%5=0 AND t%2=0 THEN 'http.route=/api/' || {c('t%3')} END,
  CASE WHEN t%7=0 THEN 'http.status_code=503'
       WHEN t%7=1 THEN 'http.status_code=418'
       WHEN t%7=2 THEN 'http.status_code=oops' END,
  CASE WHEN t%13=1 AND t%2=0 THEN 'k8s.cluster.name=cl' END,
  CASE WHEN t%13=1 THEN 'k8s.node.name=node' || {c('t%2')} END,
  CASE WHEN t%9=0 THEN 'k8s.pod.name=pp' || {c('t%2')} END,
  CASE WHEN t%5=1 AND t%3=0
       THEN 'messaging.destination=queue' || {c('t%2')} END,
  CASE WHEN t%5=1 THEN 'messaging.operation=send' END,
  CASE WHEN t%6=4 THEN 'otel.instrumentation_library.name=Old Lib' END,
  CASE WHEN t%6<4 THEN 'otel.library.name=My-Lib' || {c('t%2')} END,
  CASE WHEN t%6<4 THEN 'otel.library.version=1.0' END,
  CASE WHEN t%5=2 THEN 'rpc.method=Call' END,
  CASE WHEN t%5=2 AND t%2=0 THEN 'rpc.service=Sv' END,
  'rt=rv' || {c('t%7')},
  'sa=' || vs,
  CASE WHEN t%5=0 THEN 'service.version=2.' || {c('t%2')} END,
  'version=' || {version},
  CASE WHEN t%4=1 THEN 'w3c.tracestate=cc=1' END
], x -> x IS NOT NULL)), ',')"""
    return f"""WITH {{base}}
SELECT {hostname} AS hostname,
       CASE WHEN t%4=0 THEN 'prod' || {c('t%2')} ELSE 'none' END AS env,
       {service} AS service,
       {iln} || '.' || {kind_l} AS dd_name,
       {resource_name} AS resource_name,
       {udec("substr(md5(scrape_id), 17, 16)")} AS trace_id_dec,
       {udec("substr(md5(scrape_id), 1, 16)")} AS span_id_dec,
       CASE WHEN t%17<>0 AND t%3<>0
            THEN {udec("substr(md5(scrape_id || 'P'), 1, 16)")}
            ELSE '0' END AS parent_id_dec,
       CAST(t*1000000000 + t%997 AS BIGINT) AS start_ns,
       CASE WHEN t%29=0 THEN CAST(0 AS BIGINT)
            ELSE CAST((t%1000)*1000 + 7 AS BIGINT) END AS duration_ns,
       {dd_type} AS dd_type,
       {error} AS error,
       {meta} AS meta_s,
       CASE WHEN t%11=2 THEN '_dd1.sr.eausr=0.0'
            WHEN t%11=3 THEN '_dd1.sr.eausr=1.0'
            ELSE '' END AS metrics_s
FROM base"""


def q_datadog_rollup(spark, sf_dir, tok_dir) -> DataFrame:
    """APITrace rollup per (hostname, env, trace): span count + min
    start; EndTime mirrors the reference's inverted comparison (0)."""
    from .sinks.datadog import datadog_trace_rollup
    return datadog_trace_rollup(q_datadog(spark, sf_dir, tok_dir))


def _datadog_rollup_oracle(d: str) -> str:
    return f"""WITH dd AS ({{dd}})
SELECT hostname, env, trace_id_dec,
       count(*)::BIGINT AS n_spans,
       min(start_ns) AS trace_start,
       CAST(0 AS BIGINT) AS trace_end
FROM dd GROUP BY hostname, env, trace_id_dec"""


# ---------------------------------------------------------------------------
# jaeger family: jaegerthrifthttp + logzio + sapm (sinks/jaeger.py)
# ---------------------------------------------------------------------------

def _jaeger_spans_input(spark, tok_dir):
    from .sinks.jaeger import SFX_TOKEN_LABEL
    b = _base(spark, tok_dir)
    t = F.col("t")
    sid = F.col("scrape_id")
    h = F.md5(sid)
    zero32, zero16 = "0" * 32, "0" * 16
    nilnode = t % 31 == 0
    emptyp = (t % 21 == 0) & ~nilnode
    start_ns = (t * 1_000_000_000 + (t % 997) * 1000 + t % 7).cast("long")
    end_ns = (start_ns + (t % 1000) * 1000 + (t % 13) * 100).cast("long")

    attrs_s = F.map_concat(
        _omap_s((None, "as", F.col("vs"))),
        _omap_s(((t % 13 == 0), "span.kind", F.lit("producer"))),
        _omap_s(((t % 11 == 0), "status.code", F.lit("7"))))
    attrs_i = F.when(t % 2 == 0,
                     F.create_map(F.lit("ai"), (t % 1000).cast("long")))
    attrs_b = F.when(t % 5 == 0, F.create_map(F.lit("ab"), t % 4 < 2))
    attrs_d = F.when(t % 3 == 1,
                     F.create_map(F.lit("ad"), (t % 9) / F.lit(2.0)))

    l1 = F.struct(
        F.md5(F.concat(sid, F.lit("L"))).alias("trace_id"),
        F.substring(F.md5(F.concat(sid, F.lit("LS"))), 1, 16)
        .alias("span_id"),
        F.lit("parent").alias("link_type"))
    l2 = F.struct(F.lit(zero32).alias("trace_id"),
                  F.lit(zero16).alias("span_id"),
                  F.lit("other").alias("link_type"))
    links = F.when(t % 12 == 0, F.array(l1, l2)) \
        .when(t % 6 == 0, F.array(l1))

    nil_s = F.lit(None).cast("string")
    ann = F.struct(
        (start_ns + 12345).alias("time_ns"),
        F.when(t % 6 == 1, F.lit(""))
        .otherwise(F.concat(F.lit("d"), _s(t % 3))).alias("desc"),
        F.create_map(F.lit("ek"), F.col("vs")).alias("eattrs"),
        F.lit(False).alias("is_msg"),
        F.lit(None).cast("long").alias("msg_id"), nil_s.alias("msg_type"),
        F.lit(0).cast("long").alias("comp"),
        F.lit(0).cast("long").alias("uncomp"))
    msg = F.struct(
        (start_ns + 777).alias("time_ns"), nil_s.alias("desc"),
        F.lit(None).cast("map<string,string>").alias("eattrs"),
        F.lit(True).alias("is_msg"),
        (t % 50).cast("long").alias("msg_id"),
        F.when(t % 3 == 0, F.lit("SENT")).otherwise(F.lit("RECEIVED"))
        .alias("msg_type"),
        F.when(t % 8 < 4, t % 128).otherwise(F.lit(0)).cast("long")
        .alias("comp"),
        F.when(t % 8 < 4, 2 * (t % 128)).otherwise(F.lit(0)).cast("long")
        .alias("uncomp"))
    events = F.when(t % 4 == 1, F.array(ann)).when(t % 4 == 2, F.array(msg))

    res_labels = F.when(~emptyp, F.map_concat(
        _omap_s(((t % 3 == 0), "rk", F.concat(F.lit("rv"), _s(t % 5)))),
        _omap_s(((t % 2 == 0), SFX_TOKEN_LABEL,
                 F.concat(F.lit("tok"), _s(t % 3))))))

    return b.select(
        F.when(t % 19 == 0, F.lit(zero32)).otherwise(h).alias("trace_id"),
        F.when(t % 23 == 0, F.lit(zero16))
        .otherwise(F.substring(F.md5(F.concat(sid, F.lit("S"))), 1, 16))
        .alias("span_id"),
        F.when(t % 3 == 0, nil_s).when(t % 17 == 0, F.lit(zero16))
        .otherwise(F.substring(F.md5(F.concat(sid, F.lit("P"))), 1, 16))
        .alias("parent_span_id"),
        F.when(t % 41 == 0, nil_s)
        .otherwise(F.concat(F.lit("op-"), _s(t % 7))).alias("name"),
        F.element_at(F.array(F.lit("client"), F.lit("server"),
                             F.lit("unspecified")),
                     (t % 3 + 1).cast("int")).alias("kind"),
        start_ns.alias("start_ns"), end_ns.alias("end_ns"),
        F.when(t % 4 != 0, (t % 5).cast("int")).alias("status_code"),
        F.when(t % 2 == 0, F.concat(F.lit("m"), _s(t % 3)))
        .otherwise(F.lit("")).alias("status_message"),
        attrs_s.alias("attrs_s"), attrs_i.alias("attrs_i"),
        attrs_b.alias("attrs_b"), attrs_d.alias("attrs_d"),
        links.alias("links"), events.alias("events"),
        nilnode.alias("node_nil"),
        F.when(emptyp, F.lit(""))
        .otherwise(F.concat(F.lit("svc"), _s(t % 4))).alias("service"),
        F.when(~emptyp & (t % 3 != 1), F.concat(F.lit("hn"), _s(t % 5)))
        .otherwise(F.lit("")).alias("hostname"),
        F.when(~emptyp, t % 100).otherwise(F.lit(0)).cast("long")
        .alias("pid"),
        F.when(~emptyp & (t % 7 != 0), F.lit(1485467190) + t % 3)
        .otherwise(F.lit(0)).cast("long").alias("start_sec"),
        ((t % 1000) * 1000000).cast("long").alias("start_nanos"),
        F.when(~emptyp & (t % 2 == 0),
               F.create_map(F.lit("na"), F.concat(F.lit("nv"), _s(t % 3))))
        .alias("node_attrs"),
        F.when(~emptyp & (t % 5 == 2), F.lit("GO_LANG"))
        .otherwise(F.lit("")).alias("language"),
        F.when(~emptyp & (t % 4 < 2), F.concat(F.lit("v"), _s(t % 3)))
        .otherwise(F.lit("")).alias("exporter_version"),
        F.when(~emptyp & (t % 6 == 0), F.lit("c1")).otherwise(F.lit(""))
        .alias("core_lib_version"),
        F.when(~emptyp & (t % 2 == 1), F.lit("k8s.io/container"))
        .otherwise(F.lit("")).alias("resource_type"),
        res_labels.alias("resource_labels"),
        F.when(~emptyp & (t % 2 == 0), F.concat(F.lit("tok"), _s(t % 3)))
        .alias("token"))


def q_jaeger(spark, sf_dir, tok_dir) -> DataFrame:
    """Jaeger thrift span battery via the logzio per-span+process view:
    signed two's-complement (hi, lo) ids, per-side microsecond
    truncation, 4-type tags, span.kind/status tag suppression by
    attr-key existence, CHILD_OF/FOLLOWS_FROM refs incl. a legal
    all-zero link, annotation + message-event logs (both-zero size
    short form), the nil-node unknown-service process, the nil
    (empty) process, RFC3339Nano start.time, and quarantined zero
    trace/span ids."""
    from .sinks.jaeger import logzio_spans
    return logzio_spans(_jaeger_spans_input(spark, tok_dir))


def q_sapm(spark, sf_dir, tok_dir) -> DataFrame:
    """SAPM per-access-token batches: token from the resource label,
    token tag filtered out of the serialized process tags."""
    from .sinks.jaeger import sapm_batches
    return sapm_batches(_jaeger_spans_input(spark, tok_dir))


def _jaeger_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format

    def sgn(h):
        u = f"CAST('0x' || {h} AS UBIGINT)"
        return (f"CAST(CAST({u} AS HUGEINT) - CASE WHEN {u} >= "
                "9223372036854775808 THEN CAST(18446744073709551616 AS "
                "HUGEINT) ELSE CAST(0 AS HUGEINT) END AS BIGINT)")

    tags = f"""array_to_string(list_sort(list_filter([
  'as=STRING:' || vs,
  CASE WHEN t%13=0 THEN 'span.kind=STRING:producer' END,
  CASE WHEN t%11=0 THEN 'status.code=STRING:7' END,
  CASE WHEN t%2=0 THEN 'ai=LONG:' || {c('t%1000')} END,
  CASE WHEN t%5=0 THEN 'ab=BOOL:' ||
       CASE WHEN t%4<2 THEN 'true' ELSE 'false' END END,
  CASE WHEN t%3=1 THEN 'ad=DOUBLE:' || CAST((t%9)/2.0 AS VARCHAR) END,
  CASE WHEN t%3 IN (0,1) AND t%13<>0 THEN 'span.kind=STRING:' ||
       CASE WHEN t%3=0 THEN 'client' ELSE 'server' END END,
  CASE WHEN t%4<>0 AND t%11<>0 THEN 'status.code=LONG:' || {c('t%5')} END,
  CASE WHEN t%4<>0 AND t%11<>0 AND t%2=0
       THEN 'status.message=STRING:m' || {c('t%3')} END
], x -> x IS NOT NULL)), '|')"""

    l_hi = c(sgn("substr(md5(scrape_id || 'L'), 1, 16)"))
    l_lo = c(sgn("substr(md5(scrape_id || 'L'), 17, 16)"))
    l_sid = c(sgn("substr(md5(scrape_id || 'LS'), 1, 16)"))
    r1 = f"{l_hi} || ',' || {l_lo} || ',' || {l_sid} || ',CHILD_OF'"
    refs = f"""CASE WHEN t%12=0 THEN {r1} || ';0,0,0,FOLLOWS_FROM'
  WHEN t%6=0 THEN {r1} ELSE '' END"""

    logs = f"""CASE
  WHEN t%4=1 THEN {c('t*1000000 + t%997 + 12')} || '@ek=STRING:' || vs ||
    CASE WHEN t%6<>1 THEN ',description=STRING:d' || {c('t%3')}
         ELSE '' END
  WHEN t%4=2 THEN {c('t*1000000 + t%997')} || '@message.id=LONG:' ||
    {c('t%50')} || ',message.type=STRING:' ||
    CASE WHEN t%3=0 THEN 'SENT' ELSE 'RECEIVED' END ||
    CASE WHEN t%8<4 AND t%128<>0
         THEN ',message.compressed_size=LONG:' || {c('t%128')} ||
              ',message.uncompressed_size=LONG:' || {c('2*(t%128)')}
         ELSE '' END
  ELSE '' END"""

    rfc = ("strftime(TIMESTAMP '1970-01-01 00:00:00' + "
           "INTERVAL (1485467190 + t%3) SECOND, '%Y-%m-%dT%H:%M:%S') || "
           "CASE WHEN t%1000=0 THEN '' ELSE '.' || "
           f"rtrim(lpad({c('(t%1000)*1000000')}, 9, '0'), '0') END || 'Z'")
    proc_tags = f"""array_to_string(list_sort(list_filter([
  CASE WHEN t%2=0 THEN 'na=STRING:nv' || {c('t%3')} END,
  CASE WHEN t%3<>1 THEN 'hostname=STRING:hn' || {c('t%5')} END,
  CASE WHEN t%100<>0 THEN 'pid=LONG:' || {c('t%100')} END,
  CASE WHEN t%7<>0 THEN 'start.time=STRING:' || {rfc} END,
  CASE WHEN t%5=2 THEN 'opencensus.language=STRING:GO_LANG' END,
  CASE WHEN t%4<2 THEN 'opencensus.exporterversion=STRING:v'
       || {c('t%3')} END,
  CASE WHEN t%6=0 THEN 'opencensus.corelibversion=STRING:c1' END,
  CASE WHEN t%2=1
       THEN 'opencensus.resourcetype=STRING:k8s.io/container' END,
  CASE WHEN t%3=0 THEN 'rk=STRING:rv' || {c('t%5')} END,
  CASE WHEN t%2=0 THEN 'com.splunk.signalfx.access_token=STRING:tok'
       || {c('t%3')} END
], x -> x IS NOT NULL)), '|')"""

    return f"""WITH {{base}}
SELECT {sgn('substr(md5(scrape_id), 1, 16)')} AS trace_hi,
       {sgn('substr(md5(scrape_id), 17, 16)')} AS trace_lo,
       {sgn("substr(md5(scrape_id || 'S'), 1, 16)")} AS span_id_s,
       CASE WHEN t%3=0 OR t%17=0 THEN CAST(0 AS BIGINT)
            ELSE {sgn("substr(md5(scrape_id || 'P'), 1, 16)")}
       END AS parent_id_s,
       CASE WHEN t%41=0 THEN '' ELSE 'op-' || {c('t%7')} END AS op_name,
       CAST(t*1000000 + t%997 AS BIGINT) AS start_us,
       CAST(t%1000 + CASE WHEN t%7 + (t%13)*100 >= 1000 THEN 1 ELSE 0 END
            AS BIGINT) AS duration_us,
       {tags} AS tags_s,
       {refs} AS refs_s,
       {logs} AS logs_s,
       CASE WHEN t%31=0 THEN 'unknown-service-name'
            WHEN t%21=0 THEN NULL
            ELSE 'svc' || {c('t%4')} END AS proc_service_name,
       CASE WHEN t%31=0 THEN ''
            WHEN t%21=0 THEN NULL
            ELSE {proc_tags} END AS proc_s,
       CASE WHEN t%2=0 AND NOT (t%21=0 AND t%31<>0)
            THEN 'tok' || {c('t%3')} END AS token
FROM base
WHERE t%19<>0 AND t%23<>0"""


def _sapm_oracle(d: str) -> str:
    return """WITH jg AS ({jg})
SELECT coalesce(token, '') AS access_token,
       proc_service_name AS service,
       CASE WHEN proc_s IS NOT NULL THEN array_to_string(
         list_filter(string_split(proc_s, '|'),
           x -> NOT starts_with(x, 'com.splunk.signalfx.access_token=')),
         '|') END AS proc_tags,
       CAST(count(*) AS BIGINT) AS n_spans
FROM jg
GROUP BY access_token, service, proc_tags"""


# ---------------------------------------------------------------------------
# kinesis exporter (sinks/kinesis.py)
# ---------------------------------------------------------------------------

def q_kinesis(spark, sf_dir, tok_dir) -> DataFrame:
    """Kinesis KPL batching over jaeger-translated spans: per-span
    process attach, over-sized-span quarantine, trace-hash sharding,
    byte-offset batch assignment per shard."""
    from .sinks.kinesis import kinesis_batches
    return kinesis_batches(_jaeger_spans_input(spark, tok_dir))


def _kinesis_oracle(d: str) -> str:
    return """WITH jg AS ({jg}),
sized AS (
  SELECT trace_hi, trace_lo, span_id_s, start_us,
         CAST(length(op_name) + length(tags_s) + length(refs_s) +
              length(logs_s) + length(coalesce(proc_s, '')) + 48
              AS BIGINT) AS nbytes
  FROM jg),
kept AS (
  SELECT *,
         CAST(CAST('0x' || substr(md5(CAST(trace_hi AS VARCHAR) || ',' ||
              CAST(trace_lo AS VARCHAR)), 1, 8) AS UBIGINT) % 8 AS INT)
           AS shard
  FROM sized WHERE nbytes <= 400),
placed AS (
  SELECT shard,
         CAST(floor(coalesce(sum(nbytes) OVER (
           PARTITION BY shard ORDER BY start_us, span_id_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           / 4096.0) AS BIGINT) AS batch,
         span_id_s, nbytes
  FROM kept)
SELECT shard, batch, CAST(count(*) AS BIGINT) AS n_spans,
       CAST(sum(nbytes) AS BIGINT) AS batch_bytes,
       min(span_id_s) AS first_span, max(span_id_s) AS last_span
FROM placed GROUP BY shard, batch"""


# ---------------------------------------------------------------------------
# stackdriver exporter (sinks/stackdriver.py)
# ---------------------------------------------------------------------------

SD_MAPPINGS = [
    {"source_type": "k8s_container", "target_type": "k8s_set",
     "label_mappings": [("k8s.cluster", "cluster_name", False),
                        ("k8s.ns", "namespace", True)]},
    {"source_type": "k8s_container", "target_type": "k8s_alt",
     "label_mappings": [("alt.key", "alt", False)]},
]


def q_stackdriver(spark, sf_dir, tok_dir) -> DataFrame:
    """Stackdriver OT-SpanData battery: the first-match resource rules
    engine (required label gates the mapping, optional renamed when
    present, second mapping catches the miss, global fallback), all 7
    span kinds (UNSPECIFIED folds into internal), ok/error/unset
    status, resource-attrs-then-span-attrs merge with span-wins
    conflict, links with zero ids + empty-resource attrs, named and
    unnamed events, and dropped-count/library passthrough."""
    from .sinks.stackdriver import ot_spans
    b = _base(spark, tok_dir)
    t = F.col("t")
    sid = F.col("scrape_id")
    nil_s = F.lit(None).cast("string")

    rtype = F.when(t % 3 == 0, F.lit("k8s_container")) \
        .when(t % 3 == 1, F.lit("gce_instance")).otherwise(F.lit(""))
    res_labels = F.when(t % 11 != 0, F.map_concat(
        _omap_s(((t % 4 != 0), "k8s.cluster",
                 F.concat(F.lit("cl"), _s(t % 4)))),
        _omap_s(((t % 5 == 0), "k8s.ns", F.concat(F.lit("ns"), _s(t % 5)))),
        _omap_s(((t % 7 == 0), "alt.key", F.concat(F.lit("av"), _s(t % 6)))),
        _omap_s(((t % 2 == 0), "rk", F.concat(F.lit("rv"), _s(t % 3))))))

    attrs_s = F.map_concat(
        _omap_s((None, "as", F.col("vs"))),
        _omap_s(((t % 13 == 0), "rk", F.concat(F.lit("sp"), _s(t % 3)))))
    attrs_i = F.when(t % 2 == 0,
                     F.create_map(F.lit("ai"), (t % 100).cast("long")))
    attrs_b = F.when(t % 5 == 1, F.create_map(F.lit("ab"), t % 4 < 2))
    attrs_d = F.when(t % 3 == 1,
                     F.create_map(F.lit("ad"), (t % 7) / F.lit(2.0)))

    l1 = F.struct(
        F.md5(F.concat(sid, F.lit("L"))).alias("trace_id"),
        F.substring(F.md5(F.concat(sid, F.lit("LS"))), 1, 16)
        .alias("span_id"),
        F.when(t % 2 == 0, F.create_map(F.lit("lk"), F.col("vs")))
        .alias("attrs"))
    l2 = F.struct(F.lit("0" * 32).alias("trace_id"),
                  F.lit("0" * 16).alias("span_id"),
                  F.lit(None).cast("map<string,string>").alias("attrs"))
    links = F.when(t % 12 == 0, F.array(l1, l2)) \
        .when(t % 6 == 0, F.array(l1))

    ev1 = F.struct(F.concat(F.lit("ev"), _s(t % 3)).alias("name"),
                   (t * 1000 + 5).cast("long").alias("time_ns"),
                   F.create_map(F.lit("ek"), F.col("vs")).alias("eattrs"))
    ev2 = F.struct(F.lit("").alias("name"),
                   (t * 1000 + 9).cast("long").alias("time_ns"),
                   F.lit(None).cast("map<string,string>").alias("eattrs"))
    events = F.when(t % 4 == 1, F.array(ev1)).when(t % 4 == 2, F.array(ev2))

    spans = b.select(
        F.md5(sid).alias("trace_id"),
        F.substring(F.md5(F.concat(sid, F.lit("S"))), 1, 16)
        .alias("span_id"),
        F.when(t % 5 == 0, nil_s)
        .otherwise(F.substring(F.md5(F.concat(sid, F.lit("P"))), 1, 16))
        .alias("parent_span_id"),
        F.when(t % 41 == 0, nil_s)
        .otherwise(F.concat(F.lit("op-"), _s(t % 7))).alias("name"),
        F.element_at(F.array(*[F.lit(k) for k in (
            "unspecified", "internal", "server", "client", "producer",
            "consumer", "weird")]), (t % 7 + 1).cast("int")).alias("kind"),
        F.when(t % 3 == 0, F.lit("ok")).when(t % 3 == 1, F.lit("error"))
        .otherwise(F.lit("")).alias("status"),
        F.when(t % 2 == 1, F.concat(F.lit("m"), _s(t % 5)))
        .otherwise(F.lit("")).alias("status_message"),
        (t * 1_000_000_000).cast("long").alias("start_ns"),
        (t * 1_000_000_000 + (t % 1000) * 1000).cast("long")
        .alias("end_ns"),
        attrs_s.alias("attrs_s"), attrs_i.alias("attrs_i"),
        attrs_b.alias("attrs_b"), attrs_d.alias("attrs_d"),
        rtype.alias("resource_type"), res_labels.alias("resource_labels"),
        links.alias("links"), events.alias("events"),
        (t % 5).cast("int").alias("dropped_attrs"),
        (t % 6).cast("int").alias("dropped_events"),
        (t % 7).cast("int").alias("dropped_links"),
        F.when(t % 2 == 0, F.lit("lib")).otherwise(F.lit(""))
        .alias("il_name"),
        F.when(t % 4 == 0, F.lit("v1")).otherwise(F.lit(""))
        .alias("il_version"))
    return ot_spans(spans, SD_MAPPINGS)


def _stackdriver_oracle(d: str) -> str:
    c = "CAST({} AS VARCHAR)".format

    attrs = f"""array_to_string(list_sort(list_filter([
  'as=STRING:' || vs,
  CASE WHEN t%13=0 THEN 'rk=STRING:sp' || {c('t%3')} END,
  CASE WHEN t%2=0 THEN 'ai=LONG:' || {c('t%100')} END,
  CASE WHEN t%5=1 THEN 'ab=BOOL:' ||
       CASE WHEN t%4<2 THEN 'true' ELSE 'false' END END,
  CASE WHEN t%3=1 THEN 'ad=DOUBLE:' || CAST((t%7)/2.0 AS VARCHAR) END,
  CASE WHEN t%4<>0 AND t%11<>0
       THEN 'k8s.cluster=STRING:cl' || {c('t%4')} END,
  CASE WHEN t%5=0 AND t%11<>0 THEN 'k8s.ns=STRING:ns' || {c('t%5')} END,
  CASE WHEN t%7=0 AND t%11<>0 THEN 'alt.key=STRING:av' || {c('t%6')} END,
  CASE WHEN t%2=0 AND t%11<>0 AND t%13<>0
       THEN 'rk=STRING:rv' || {c('t%3')} END
], x -> x IS NOT NULL)), '|')"""

    mr_type = """CASE
  WHEN t%3=0 AND t%11<>0 AND t%4<>0 THEN 'k8s_set'
  WHEN t%3=0 AND t%11<>0 AND t%7=0 THEN 'k8s_alt'
  ELSE 'global' END"""
    mr_labels = f"""CASE
  WHEN t%3=0 AND t%11<>0 AND t%4<>0 THEN array_to_string(list_sort(
    list_filter(['cluster_name=cl' || {c('t%4')},
      CASE WHEN t%5=0 THEN 'namespace=ns' || {c('t%5')} END],
      x -> x IS NOT NULL)), '|')
  WHEN t%3=0 AND t%11<>0 AND t%7=0 THEN 'alt=av' || {c('t%6')}
  ELSE '' END"""

    l1 = ("md5(scrape_id || 'L') || '@' || "
          "substr(md5(scrape_id || 'LS'), 1, 16) || '@' || "
          "CASE WHEN t%2=0 THEN 'lk=STRING:' || vs ELSE '' END")
    links = f"""CASE
  WHEN t%12=0 THEN {l1} || ';' || repeat('0',32) || '@' ||
       repeat('0',16) || '@'
  WHEN t%6=0 THEN {l1} ELSE '' END"""
    events = f"""CASE
  WHEN t%4=1 THEN 'ev' || {c('t%3')} || '@' || {c('t*1000+5')} ||
       '@ek=STRING:' || vs
  WHEN t%4=2 THEN '@' || {c('t*1000+9')} || '@' ELSE '' END"""

    return f"""WITH {{base}}
SELECT md5(scrape_id) AS trace_id,
       substr(md5(scrape_id || 'S'), 1, 16) AS span_id,
       CASE WHEN t%5=0 THEN ''
            ELSE substr(md5(scrape_id || 'P'), 1, 16) END AS parent_id,
       CASE WHEN t%41=0 THEN '' ELSE 'op-' || {c('t%7')} END AS span_name,
       CASE t%7 WHEN 0 THEN 'internal' WHEN 1 THEN 'internal'
                WHEN 2 THEN 'server' WHEN 3 THEN 'client'
                WHEN 4 THEN 'producer' WHEN 5 THEN 'consumer'
                ELSE 'unspecified' END AS ot_kind,
       CAST(t*1000000000 AS BIGINT) AS start_ns,
       CAST(t*1000000000 + (t%1000)*1000 AS BIGINT) AS end_ns,
       {attrs} AS attrs_s_out,
       {links} AS links_s,
       {events} AS events_s,
       CASE WHEN t%3=0 THEN 'ok' WHEN t%3=1 THEN 'error'
            ELSE 'unset' END AS ot_status,
       CASE WHEN t%2=1 THEN 'm' || {c('t%5')} ELSE '' END
         AS status_message,
       CAST(t%5 AS INT) AS dropped_attrs,
       CAST(t%6 AS INT) AS dropped_events,
       CAST(t%7 AS INT) AS dropped_links,
       CASE WHEN t%2=0 THEN 'lib' ELSE '' END AS il_name,
       CASE WHEN t%4=0 THEN 'v1' ELSE '' END AS il_version,
       {mr_type} AS mr_type,
       {mr_labels} AS mr_labels
FROM base"""


def export_queries() -> dict:
    return {
        "azure_envelopes": q_azure,
        "hec_logs": q_hec_logs,
        "hec_metrics": q_hec_metrics,
        "hec_spans": q_hec_spans,
        "datadog_spans": q_datadog,
        "datadog_traces": q_datadog_rollup,
        "jaeger_spans": q_jaeger,
        "sapm_batches": q_sapm,
        "stackdriver_spans": q_stackdriver,
        "kinesis_batches": q_kinesis,
    }


def export_oracles(d: str) -> dict[str, str]:
    base = _base_sql(d)
    dd = _datadog_oracle(d).replace("{base}", base)
    return {
        "azure_envelopes": _azure_oracle(d).replace("{base}", base),
        "hec_logs": _hec_logs_oracle(d).replace("{base}", base),
        "hec_metrics": _hec_metrics_oracle(d).replace("{base}", base),
        "hec_spans": _hec_spans_oracle(d).replace("{base}", base),
        "datadog_spans": dd,
        "datadog_traces": _datadog_rollup_oracle(d).replace("{dd}", dd),
        "jaeger_spans": _jaeger_oracle(d).replace("{base}", base),
        "sapm_batches": _sapm_oracle(d).replace(
            "{jg}", _jaeger_oracle(d).replace("{base}", base)),
        "stackdriver_spans": _stackdriver_oracle(d).replace("{base}", base),
        "kinesis_batches": _kinesis_oracle(d).replace(
            "{jg}", _jaeger_oracle(d).replace("{base}", base)),
    }
