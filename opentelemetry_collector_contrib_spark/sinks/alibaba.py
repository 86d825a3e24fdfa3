"""alibabacloudlogserviceexporter analog — log records → SLS KV rows.

Reference: ``exporter/alibabacloudlogserviceexporter/
logsdata_to_logservice.go`` —

- records with a NULL body are dropped and counted
  (``mapLogRecordToLogService`` :104-106);
- resource contents (:52-90): ``host`` = resource ``host.name`` else
  ``""``, ``service`` = resource ``service.name`` else ``""``, and
  ``resource`` = the REMAINING resource attributes JSON-marshaled —
  Go's ``json.Marshal`` of a map emits keys in sorted order, mirrored
  here by serializing a key-sorted entry list;
- instrumentation library → ``otlp.name`` / ``otlp.version`` (:91-102);
- per-record contents (:107-160): ``timeUnixNano`` decimal,
  ``severityNumber`` decimal, ``severityText``, ``name``,
  ``attribute`` = record attributes JSON (sorted, as above),
  ``content`` = body string, ``flags`` lowercase hex, ``traceID`` /
  ``spanID`` hex strings;
- ``Time`` = timestamp / 1e9 when the timestamp is set (:161-166;
  the now() fallback is not reproducible in batch and surfaces as
  NULL here for the caller to fill).

Batch shape: one Catalyst projection per record — the KV "contents"
become typed columns plus two JSON strings.  ``to_json`` over
``map_from_entries(array_sort(map_entries(m)))`` gives the same
sorted-key JSON as Go's map marshal, with real JSON escaping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _sorted_json(m):
    """JSON-marshal a map<string,string> with byte-sorted keys (Go
    json.Marshal map semantics)."""
    return F.to_json(F.map_from_entries(F.array_sort(F.map_entries(m))))


def logservice_rows(df: DataFrame) -> DataFrame:
    """Input columns: body (nullable string; NULL = pdata NULL body),
    ts_ns, severity_number int, severity_text, name, flags int,
    trace_id, span_id, attrs map<string,string>, resource
    map<string,string>, lib_name, lib_version.  Output: the SLS content
    battery + ``time_sec`` (NULL when ts_ns == 0, the reference's
    now() fallback)."""
    res = F.col("resource")
    rest = F.map_filter(
        res, lambda k, v: ~k.isin("host.name", "service.name"))
    return (df
            .filter(F.col("body").isNotNull())
            .select(
                F.coalesce(F.try_element_at(res, F.lit("host.name")),
                           F.lit("")).alias("host"),
                F.coalesce(F.try_element_at(res, F.lit("service.name")),
                           F.lit("")).alias("service"),
                _sorted_json(rest).alias("resource_json"),
                F.col("lib_name").alias("otlp_name"),
                F.col("lib_version").alias("otlp_version"),
                F.col("ts_ns").cast("string").alias("time_unix_nano"),
                F.col("severity_number").cast("string")
                .alias("severity_number"),
                "severity_text", "name",
                _sorted_json(F.col("attrs")).alias("attribute_json"),
                F.col("body").alias("content"),
                F.lower(F.hex(F.col("flags"))).alias("flags"),
                "trace_id", "span_id",
                F.when(F.col("ts_ns") > 0,
                       F.floor(F.col("ts_ns") / F.lit(1_000_000_000))
                       .cast("bigint")).alias("time_sec")))
