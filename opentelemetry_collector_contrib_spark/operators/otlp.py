"""OTLP/JSON logs codec — the collector's NATIVE wire format.

Every component in the reference speaks pdata, which IS the OTLP
proto tree (go.opentelemetry.io/collector/consumer/pdata — e.g.
receiver/splunkhecreceiver/splunk_to_logdata.go:35-39 builds
ResourceLogs -> InstrumentationLibraryLogs -> LogRecord; the
``otlp``/``otlphttp`` exporter+receiver pair in the core collector
moves exactly this tree between collectors).  This module implements
the OTLP **JSON** encoding of that tree (proto3 canonical JSON per the
public opentelemetry-proto spec) as pure-Catalyst transforms:

- serialize (exporter side): flat rows -> one ExportLogsServiceRequest
  JSON per resource group — ``collect_list`` of record structs +
  ``to_json``, ONE shuffle keyed by the resource signature (the same
  cost shape as batchperresourceattr);
- parse (receiver side): request JSON -> flat rows — ``from_json``
  with an explicit schema + three explodes + ``map_from_entries``,
  zero Python, zero shuffle.

proto3 JSON quirks implemented faithfully (public mapping rules):
- int64 fields (``timeUnixNano``, ``intValue``) are JSON **strings**;
- oneof AnyValue emits exactly one of stringValue / intValue /
  doubleValue / boolValue (``to_json`` drops null struct fields, which
  matches the canonical omit-unset rule);
- trace/span ids are lowercase hex strings (16 / 8 bytes).

Era note: this tree uses ``instrumentationLibraryLogs`` /
``instrumentationLibrary`` — the field names of the OTLP revision the
reference's pdata vendors — not the later ``scopeLogs`` rename.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# AnyValue restricted to the scalar oneof arms (arrayValue/kvlistValue
# round-trip the same way but never occur in this pipeline's rows).
_ANY = ("struct<stringValue:string,intValue:string,"
        "doubleValue:double,boolValue:boolean>")
_ATTRS = f"array<struct<key:string,value:{_ANY}>>"
_RECORD = (f"struct<timeUnixNano:string,severityNumber:int,"
           f"severityText:string,body:{_ANY},attributes:{_ATTRS},"
           f"droppedAttributesCount:int,traceId:string,spanId:string>")

OTLP_LOGS_REQUEST_DDL = (
    f"resourceLogs array<struct<"
    f"resource:struct<attributes:{_ATTRS},droppedAttributesCount:int>,"
    f"instrumentationLibraryLogs:array<struct<"
    f"instrumentationLibrary:struct<name:string,version:string>,"
    f"logRecords:array<{_RECORD}>>>>>")


def any_string(v: Column) -> Column:
    """AnyValue struct -> display string (pdata AttributeValue
    stringification order: the set oneof arm wins; exactly one is set)."""
    return F.coalesce(v.stringValue, v.intValue,
                      v.doubleValue.cast("string"),
                      v.boolValue.cast("string"))


def attrs_to_map(attrs: Column) -> Column:
    """OTLP attribute list -> map<string,string> (insert-if-absent is
    the pdata Map discipline; OTLP lists carry unique keys)."""
    return F.map_from_entries(
        F.transform(attrs, lambda a: F.struct(
            a.key.alias("key"), any_string(a.value).alias("value"))))


def _str_any(c: Column) -> Column:
    return F.struct(
        c.alias("stringValue"),
        F.lit(None).cast("string").alias("intValue"),
        F.lit(None).cast("double").alias("doubleValue"),
        F.lit(None).cast("boolean").alias("boolValue"))


def _int_any(c: Column) -> Column:
    # proto3 JSON: int64 rides as a decimal string
    return F.struct(
        F.lit(None).cast("string").alias("stringValue"),
        c.cast("string").alias("intValue"),
        F.lit(None).cast("double").alias("doubleValue"),
        F.lit(None).cast("boolean").alias("boolValue"))


def _dbl_any(c: Column) -> Column:
    return F.struct(
        F.lit(None).cast("string").alias("stringValue"),
        F.lit(None).cast("string").alias("intValue"),
        c.cast("double").alias("doubleValue"),
        F.lit(None).cast("boolean").alias("boolValue"))


def _attr(key: str, value: Column) -> Column:
    return F.struct(F.lit(key).alias("key"), value.alias("value"))


def serialize_otlp_logs(df: DataFrame, *,
                        resource_col: str = "service",
                        scope_name: str = "opentelemetry_collector_contrib_spark",
                        scope_version: str = "0.2") -> DataFrame:
    """Flat log rows -> (resource key, request:string) — one OTLP/JSON
    ExportLogsServiceRequest per resource group.

    Expects columns: ``ts_unix_nano`` (long), ``severity_number`` (int),
    ``severity_text``, ``body`` (string), ``int_attrs`` map<string,long>,
    ``dbl_attrs`` map<string,double>, ``trace_id``, ``span_id`` and the
    ``resource_col``.  The request layout mirrors what the reference's
    pdata marshals (splunk_to_logdata.go:35-56 tree shape)."""
    rec = F.struct(
        F.col("ts_unix_nano").cast("string").alias("timeUnixNano"),
        F.col("severity_number").cast("int").alias("severityNumber"),
        F.col("severity_text").alias("severityText"),
        _str_any(F.col("body")).alias("body"),
        F.concat(
            F.transform(F.map_entries("int_attrs"),
                        lambda e: F.struct(e.key.alias("key"),
                                           _int_any(e.value).alias("value"))),
            F.transform(F.map_entries("dbl_attrs"),
                        lambda e: F.struct(e.key.alias("key"),
                                           _dbl_any(e.value).alias("value"))),
        ).alias("attributes"),
        F.lit(0).alias("droppedAttributesCount"),
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"))
    grouped = (df.select(F.col(resource_col).alias("_res"), rec.alias("_rec"))
               .groupBy("_res")
               .agg(F.collect_list("_rec").alias("_recs")))
    request = F.to_json(F.struct(F.array(F.struct(
        F.struct(
            F.array(_attr("service.name", _str_any(F.col("_res"))))
            .alias("attributes"),
            F.lit(0).alias("droppedAttributesCount")).alias("resource"),
        F.array(F.struct(
            F.struct(F.lit(scope_name).alias("name"),
                     F.lit(scope_version).alias("version"))
            .alias("instrumentationLibrary"),
            F.col("_recs").alias("logRecords")))
        .alias("instrumentationLibraryLogs"))).alias("resourceLogs")))
    return grouped.select(F.col("_res").alias("resource"),
                          request.alias("request"))


_SPAN = (f"struct<traceId:string,spanId:string,parentSpanId:string,"
         f"name:string,kind:string,startTimeUnixNano:string,"
         f"endTimeUnixNano:string,attributes:{_ATTRS},"
         f"status:struct<code:string,message:string>>")

OTLP_TRACES_REQUEST_DDL = (
    f"resourceSpans array<struct<"
    f"resource:struct<attributes:{_ATTRS},droppedAttributesCount:int>,"
    f"instrumentationLibrarySpans:array<struct<"
    f"instrumentationLibrary:struct<name:string,version:string>,"
    f"spans:array<{_SPAN}>>>>>")

# proto3 canonical JSON serializes enums by NAME (public mapping rule);
# these are the OTLP SpanKind / StatusCode names of the reference's
# pdata era (consumer/pdata SpanKind*/StatusCode*)
SPAN_KINDS = ["SPAN_KIND_UNSPECIFIED", "SPAN_KIND_INTERNAL",
              "SPAN_KIND_SERVER", "SPAN_KIND_CLIENT",
              "SPAN_KIND_PRODUCER", "SPAN_KIND_CONSUMER"]


def serialize_otlp_spans(df: DataFrame, *,
                         resource_col: str = "service",
                         scope_name: str = "opentelemetry_collector_contrib_spark",
                         scope_version: str = "0.2") -> DataFrame:
    """Flat span rows -> one ExportTraceServiceRequest JSON per resource
    group.  Expects: ``trace_id``/``span_id``/``parent_span_id`` (hex),
    ``name``, ``kind`` (enum name), ``start_unix_nano``/``end_unix_nano``
    (long), ``status_code`` (enum name), ``status_message``,
    ``int_attrs``/``dbl_attrs`` maps, plus ``resource_col``."""
    span = F.struct(
        F.col("trace_id").alias("traceId"),
        F.col("span_id").alias("spanId"),
        F.col("parent_span_id").alias("parentSpanId"),
        F.col("name").alias("name"),
        F.col("kind").alias("kind"),
        F.col("start_unix_nano").cast("string").alias("startTimeUnixNano"),
        F.col("end_unix_nano").cast("string").alias("endTimeUnixNano"),
        F.concat(
            F.transform(F.map_entries("int_attrs"),
                        lambda e: F.struct(e.key.alias("key"),
                                           _int_any(e.value).alias("value"))),
            F.transform(F.map_entries("dbl_attrs"),
                        lambda e: F.struct(e.key.alias("key"),
                                           _dbl_any(e.value).alias("value"))),
        ).alias("attributes"),
        F.struct(F.col("status_code").alias("code"),
                 F.col("status_message").alias("message")).alias("status"))
    grouped = (df.select(F.col(resource_col).alias("_res"),
                         span.alias("_sp"))
               .groupBy("_res").agg(F.collect_list("_sp").alias("_sps")))
    request = F.to_json(F.struct(F.array(F.struct(
        F.struct(
            F.array(_attr("service.name", _str_any(F.col("_res"))))
            .alias("attributes"),
            F.lit(0).alias("droppedAttributesCount")).alias("resource"),
        F.array(F.struct(
            F.struct(F.lit(scope_name).alias("name"),
                     F.lit(scope_version).alias("version"))
            .alias("instrumentationLibrary"),
            F.col("_sps").alias("spans")))
        .alias("instrumentationLibrarySpans"))).alias("resourceSpans")))
    return grouped.select(F.col("_res").alias("resource"),
                          request.alias("request"))


def parse_otlp_spans(df: DataFrame, json_col: str = "request") -> DataFrame:
    """OTLP/JSON trace requests -> flat span rows (receiver side, pure
    codegen)."""
    parsed = df.select(
        F.from_json(F.col(json_col), OTLP_TRACES_REQUEST_DDL).alias("_r"))
    rs = parsed.select(F.explode("_r.resourceSpans").alias("_rs"))
    ils = rs.select(
        attrs_to_map(F.col("_rs.resource.attributes")).alias("resource_attrs"),
        F.explode("_rs.instrumentationLibrarySpans").alias("_ils"))
    sp = ils.select(
        "resource_attrs",
        F.col("_ils.instrumentationLibrary.name").alias("scope_name"),
        F.col("_ils.instrumentationLibrary.version").alias("scope_version"),
        F.explode("_ils.spans").alias("_sp"))
    return sp.select(
        "resource_attrs", "scope_name", "scope_version",
        F.col("_sp.traceId").alias("trace_id"),
        F.col("_sp.spanId").alias("span_id"),
        F.col("_sp.parentSpanId").alias("parent_span_id"),
        F.col("_sp.name").alias("name"),
        F.col("_sp.kind").alias("kind"),
        F.col("_sp.startTimeUnixNano").cast("long").alias("start_unix_nano"),
        F.col("_sp.endTimeUnixNano").cast("long").alias("end_unix_nano"),
        attrs_to_map(F.col("_sp.attributes")).alias("attrs"),
        F.col("_sp.status.code").alias("status_code"),
        F.col("_sp.status.message").alias("status_message"))


# -- metrics (era v0.5: datapoints carry LABELS — StringKeyValue pairs,
# not attributes; int points ride int64-as-string; the data oneof arms
# are intGauge / doubleGauge / intSum / doubleSum / doubleHistogram) --

_LABELS = "array<struct<key:string,value:string>>"
_DP_D = (f"struct<labels:{_LABELS},timeUnixNano:string,value:double>")
_DP_I = (f"struct<labels:{_LABELS},timeUnixNano:string,value:string>")
_DP_H = (f"struct<labels:{_LABELS},timeUnixNano:string,count:string,"
         f"sum:double,bucketCounts:array<string>,"
         f"explicitBounds:array<double>>")
_METRIC = (f"struct<name:string,description:string,unit:string,"
           f"doubleGauge:struct<dataPoints:array<{_DP_D}>>,"
           f"intSum:struct<dataPoints:array<{_DP_I}>,"
           f"isMonotonic:boolean,aggregationTemporality:string>,"
           f"doubleHistogram:struct<dataPoints:array<{_DP_H}>,"
           f"aggregationTemporality:string>>")

OTLP_METRICS_REQUEST_DDL = (
    f"resourceMetrics array<struct<"
    f"resource:struct<attributes:{_ATTRS},droppedAttributesCount:int>,"
    f"instrumentationLibraryMetrics:array<struct<"
    f"instrumentationLibrary:struct<name:string,version:string>,"
    f"metrics:array<{_METRIC}>>>>>")

AGG_CUMULATIVE = "AGGREGATION_TEMPORALITY_CUMULATIVE"
AGG_DELTA = "AGGREGATION_TEMPORALITY_DELTA"


def labels_to_map(labels: Column) -> Column:
    return F.map_from_entries(labels)


def _labels(m: Column) -> Column:
    return F.transform(F.map_entries(m),
                       lambda e: F.struct(e.key.alias("key"),
                                          e.value.alias("value")))


def serialize_otlp_metrics(df: DataFrame, *,
                           resource_col: str = "service",
                           scope_name: str = "opentelemetry_collector_contrib_spark",
                           scope_version: str = "0.2") -> DataFrame:
    """Flat datapoint rows -> one ExportMetricsServiceRequest per
    resource.  Expects: ``name``/``unit``/``mtype`` ('double_gauge' or
    'int_sum'), ``labels`` map<string,string>, ``ts_unix_nano`` long,
    ``value_d`` double / ``value_i`` long (per arm), and
    ``resource_col``.  Datapoints of one (resource, name) collapse into
    ONE metric — two chained groupBys, both keyed inside the resource
    signature."""
    dp_d = F.struct(_labels(F.col("labels")).alias("labels"),
                    F.col("ts_unix_nano").cast("string")
                    .alias("timeUnixNano"),
                    F.col("value_d").alias("value"))
    dp_i = F.struct(_labels(F.col("labels")).alias("labels"),
                    F.col("ts_unix_nano").cast("string")
                    .alias("timeUnixNano"),
                    F.col("value_i").cast("string").alias("value"))
    per_metric = (df.select(
        F.col(resource_col).alias("_res"), "name", "unit", "mtype",
        F.when(F.col("mtype") == "double_gauge", dp_d).alias("_dpd"),
        F.when(F.col("mtype") == "int_sum", dp_i).alias("_dpi"))
        .groupBy("_res", "name", "unit", "mtype")
        .agg(F.collect_list("_dpd").alias("_dps_d"),
             F.collect_list("_dpi").alias("_dps_i")))
    metric = F.struct(
        F.col("name"), F.lit("").alias("description"), F.col("unit"),
        F.when(F.col("mtype") == "double_gauge",
               F.struct(F.col("_dps_d").alias("dataPoints")))
        .alias("doubleGauge"),
        F.when(F.col("mtype") == "int_sum",
               F.struct(F.col("_dps_i").alias("dataPoints"),
                        F.lit(True).alias("isMonotonic"),
                        F.lit(AGG_CUMULATIVE)
                        .alias("aggregationTemporality")))
        .alias("intSum"),
        F.lit(None).cast(
            f"struct<dataPoints:array<{_DP_H}>,"
            f"aggregationTemporality:string>").alias("doubleHistogram"))
    per_res = (per_metric.select("_res", metric.alias("_m"))
               .groupBy("_res").agg(F.collect_list("_m").alias("_ms")))
    request = F.to_json(F.struct(F.array(F.struct(
        F.struct(
            F.array(_attr("service.name", _str_any(F.col("_res"))))
            .alias("attributes"),
            F.lit(0).alias("droppedAttributesCount")).alias("resource"),
        F.array(F.struct(
            F.struct(F.lit(scope_name).alias("name"),
                     F.lit(scope_version).alias("version"))
            .alias("instrumentationLibrary"),
            F.col("_ms").alias("metrics")))
        .alias("instrumentationLibraryMetrics"))).alias("resourceMetrics")))
    return per_res.select(F.col("_res").alias("resource"),
                          request.alias("request"))


def parse_otlp_metrics(df: DataFrame,
                       json_col: str = "request") -> DataFrame:
    """OTLP/JSON metric requests -> flat datapoint rows (pure codegen).
    Gauge and sum arms are re-flattened into one row shape; histogram
    datapoints surface with serialized bucket arrays."""
    parsed = df.select(
        F.from_json(F.col(json_col), OTLP_METRICS_REQUEST_DDL).alias("_r"))
    rm = parsed.select(F.explode("_r.resourceMetrics").alias("_rm"))
    ilm = rm.select(
        attrs_to_map(F.col("_rm.resource.attributes"))
        .alias("resource_attrs"),
        F.explode("_rm.instrumentationLibraryMetrics").alias("_ilm"))
    m = ilm.select(
        "resource_attrs",
        F.col("_ilm.instrumentationLibrary.name").alias("scope_name"),
        F.explode("_ilm.metrics").alias("_m"))
    g = m.filter(F.col("_m.doubleGauge").isNotNull()).select(
        "resource_attrs", "scope_name",
        F.col("_m.name").alias("name"), F.col("_m.unit").alias("unit"),
        F.lit("double_gauge").alias("mtype"),
        F.explode("_m.doubleGauge.dataPoints").alias("_dp")).select(
        "resource_attrs", "scope_name", "name", "unit", "mtype",
        labels_to_map(F.col("_dp.labels")).alias("labels"),
        F.col("_dp.timeUnixNano").cast("long").alias("ts_unix_nano"),
        F.col("_dp.value").alias("value_d"),
        F.lit(None).cast("long").alias("value_i"),
        F.lit(None).cast("string").alias("temporality"),
        F.lit(None).cast("boolean").alias("monotonic"),
        *_no_hist())
    s = m.filter(F.col("_m.intSum").isNotNull()).select(
        "resource_attrs", "scope_name",
        F.col("_m.name").alias("name"), F.col("_m.unit").alias("unit"),
        F.lit("int_sum").alias("mtype"),
        F.col("_m.intSum.aggregationTemporality").alias("_t"),
        F.col("_m.intSum.isMonotonic").alias("_mono"),
        F.explode("_m.intSum.dataPoints").alias("_dp")).select(
        "resource_attrs", "scope_name", "name", "unit", "mtype",
        labels_to_map(F.col("_dp.labels")).alias("labels"),
        F.col("_dp.timeUnixNano").cast("long").alias("ts_unix_nano"),
        F.lit(None).cast("double").alias("value_d"),
        F.col("_dp.value").cast("long").alias("value_i"),
        F.col("_t").alias("temporality"),
        F.col("_mono").alias("monotonic"),
        *_no_hist())
    h = m.filter(F.col("_m.doubleHistogram").isNotNull()).select(
        "resource_attrs", "scope_name",
        F.col("_m.name").alias("name"), F.col("_m.unit").alias("unit"),
        F.lit("double_histogram").alias("mtype"),
        F.col("_m.doubleHistogram.aggregationTemporality").alias("_t"),
        F.explode("_m.doubleHistogram.dataPoints").alias("_dp")).select(
        "resource_attrs", "scope_name", "name", "unit", "mtype",
        labels_to_map(F.col("_dp.labels")).alias("labels"),
        F.col("_dp.timeUnixNano").cast("long").alias("ts_unix_nano"),
        F.lit(None).cast("double").alias("value_d"),
        F.lit(None).cast("long").alias("value_i"),
        F.col("_t").alias("temporality"),
        F.lit(None).cast("boolean").alias("monotonic"),
        F.col("_dp.count").cast("long").alias("hist_count"),
        F.col("_dp.sum").alias("hist_sum"),
        F.concat_ws(",", F.col("_dp.bucketCounts"))
        .alias("bucket_counts_s"),
        F.concat_ws(",", F.col("_dp.explicitBounds").cast("array<string>"))
        .alias("bounds_s"))
    return g.unionByName(s).unionByName(h)


def _no_hist():
    # built lazily: DDL-string casts need a live SparkContext, so this
    # must not run at module import (see the pandas-UDF gotcha)
    return [
        F.lit(None).cast("long").alias("hist_count"),
        F.lit(None).cast("double").alias("hist_sum"),
        F.lit(None).cast("string").alias("bucket_counts_s"),
        F.lit(None).cast("string").alias("bounds_s"),
    ]


def parse_otlp_logs(df: DataFrame, json_col: str = "request") -> DataFrame:
    """OTLP/JSON requests -> flat log rows (receiver side).  Pure
    codegen: explicit-schema from_json, three explodes, map extraction
    — the schema-on-read discipline of json_parser.py (never inference
    on the hot path)."""
    parsed = df.select(
        F.from_json(F.col(json_col), OTLP_LOGS_REQUEST_DDL).alias("_r"))
    rl = parsed.select(F.explode("_r.resourceLogs").alias("_rl"))
    ill = rl.select(
        attrs_to_map(F.col("_rl.resource.attributes")).alias("resource_attrs"),
        F.explode("_rl.instrumentationLibraryLogs").alias("_ill"))
    lr = ill.select(
        "resource_attrs",
        F.col("_ill.instrumentationLibrary.name").alias("scope_name"),
        F.col("_ill.instrumentationLibrary.version").alias("scope_version"),
        F.explode("_ill.logRecords").alias("_lr"))
    return lr.select(
        "resource_attrs", "scope_name", "scope_version",
        F.col("_lr.timeUnixNano").cast("long").alias("ts_unix_nano"),
        F.col("_lr.severityNumber").alias("severity_number"),
        F.col("_lr.severityText").alias("severity_text"),
        any_string(F.col("_lr.body")).alias("body"),
        attrs_to_map(F.col("_lr.attributes")).alias("attrs"),
        F.col("_lr.traceId").alias("trace_id"),
        F.col("_lr.spanId").alias("span_id"))
