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
