"""Jaeger-family exporter analogs: jaegerthrifthttp, logzio, sapm.

Reference semantics:

- ``exporter/jaegerthrifthttpexporter/protospan_to_jaegerthrift.go`` —
  the OC→Jaeger thrift span translation:

  * ids (:476-493): trace id = 16 bytes → (hi, lo) SIGNED int64 pair
    (two's complement of each 8-byte half); span/parent ids → signed
    int64; a zero trace id or zero span id is an error that fails the
    batch (:181-182, :192-193) — the batch analog quarantines those
    rows (``jaeger_spans`` drops them; the count is observable via the
    input/output row delta, mirroring the exporter's dropped-span
    return);
  * parent id 0 when absent/empty (:195-202);
  * timestamps → epoch MICROseconds with per-side truncation
    (:426-431): duration = trunc(end_ns/1e3) - trunc(start_ns/1e3);
  * typed tags (:433-474): STRING/LONG/BOOL/DOUBLE from the OC
    attribute value kinds;
  * a ``span.kind`` tag is appended only for CLIENT/SERVER kinds and
    only when the span attrs do not already carry a ``span.kind`` key
    (:218-221, :296-317);
  * ``status.code`` (LONG, always when status set) and
    ``status.message`` (STRING, when non-empty) are appended only when
    NEITHER key exists in the span attrs (:222-226, :273-294);
  * links → references (:233-271): PARENT_LINKED_SPAN → CHILD_OF, all
    others → FOLLOWS_FROM; link ids are converted without the zero
    check (a zero link id is legal);
  * time events → logs (:319-417): annotation = attr tags + a
    ``description`` STRING tag appended last when non-empty; message
    event = ``message.id`` LONG + ``message.type`` STRING, plus
    ``message.compressed_size``/``message.uncompressed_size`` LONG
    only when not both zero (:392-396);
  * process (:49-167): node attrs as STRING tags + ``hostname`` (when
    non-empty) + ``pid`` LONG (when non-zero) + ``start.time`` STRING
    (RFC3339Nano, when seconds non-zero) + ``opencensus.language`` /
    ``opencensus.exporterversion`` / ``opencensus.corelibversion``
    (when set) + ``opencensus.resourcetype`` + resource labels; a nil
    node returns the "unknown-service-name" process IMMEDIATELY,
    ignoring the resource (:50-53); an empty service with zero tags
    yields a nil process (:156-159).

- ``exporter/logzioexporter/exporter.go:98-114`` — each jaeger span is
  written with its batch process attached (``span.Process =
  batch.Process``): ``logzio_spans`` embeds (service_name, process
  tags) on every span row.

- ``exporter/sapmexporter/exporter.go:91-130,146-166`` — traces are
  batched per the ``com.splunk.signalfx.access_token`` resource
  attribute (via batchperresourceattr) and the token tag is filtered
  OUT of the process tags before export: ``sapm_batches`` groups by
  token with the token tag removed from the serialized process.

Tags serialize as sorted ``key=TYPE:value`` joined by ``|`` so the
DuckDB oracle can compare deterministically (Go map iteration order is
not semantic).  All expressions are Catalyst (codegen) — no Python on
the row path; the SAPM rollup is one two-phase aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

SFX_TOKEN_LABEL = "com.splunk.signalfx.access_token"
UNKNOWN_SERVICE = "unknown-service-name"

def _empty_arr():
    return F.array().cast(ArrayType(StringType()))


def signed64(hex_col):
    """BytesToInt64 (:476-493): 16 hex chars → signed int64 (two's
    complement).  Pure decimal(20,0) arithmetic — no Python."""
    u = F.conv(hex_col, 16, 10).cast("decimal(20,0)")
    two63 = F.expr("CAST('9223372036854775808' AS DECIMAL(20,0))")
    two64 = F.expr("CAST('18446744073709551616' AS DECIMAL(21,0))")
    return F.when(u >= two63, (u - two64).cast("long")) \
        .otherwise(u.cast("long"))


def _tag(cond, key: str, vtype: str, val):
    s = F.concat(F.lit(f"{key}={vtype}:"), val.cast("string"))
    return F.when(cond, F.array(s)).otherwise(_empty_arr())


def _map_tags(m, vtype: str, fmt=None):
    """map → array of serialized typed tags."""
    fmt = fmt or (lambda v: v.cast("string"))
    return F.when(m.isNotNull(), F.transform(
        F.map_entries(m),
        lambda e: F.concat(e["key"], F.lit(f"={vtype}:"), fmt(e["value"])))
    ).otherwise(_empty_arr())


def _bool_s(v):
    return F.when(v, F.lit("true")).otherwise(F.lit("false"))


def _join_tags(*arrays):
    return F.array_join(F.array_sort(F.concat(*arrays)), "|")


def _us(ns_col):
    """ns → µs truncation in exact decimal arithmetic: `/` on longs is
    DOUBLE division in Spark, and ns epochs (~1.6e18) exceed 2^53, so
    float division is off by ±1 µs."""
    return F.floor(ns_col.cast("decimal(20,0)") / 1000).cast("long")


def _attr_has(key, *maps):
    """OCAttributeKeyExist: the OC AttributeMap holds all value kinds
    in one map — existence is checked across every typed column."""
    cond = F.lit(False)
    for m in maps:
        cond = cond | (m.isNotNull() &
                       F.array_contains(F.map_keys(m), key))
    return cond


def rfc3339nano(sec_col, nanos_col):
    """Go time.RFC3339Nano in UTC: fraction with trailing zeros (and
    the dot, when zero) trimmed."""
    base = F.date_format(F.timestamp_seconds(sec_col),
                         "yyyy-MM-dd'T'HH:mm:ss")
    frac = F.regexp_replace(F.lpad(nanos_col.cast("string"), 9, "0"),
                            "0+$", "")
    return F.concat(base,
                    F.when(frac != "", F.concat(F.lit("."), frac))
                    .otherwise(F.lit("")),
                    F.lit("Z"))


def jaeger_spans(spans: DataFrame) -> DataFrame:
    """protospan_to_jaegerthrift.go:169-231.  Input columns: trace_id
    (32 hex), span_id (16 hex), parent_span_id (16 hex, nullable),
    name, kind (lowercase), start_ns, end_ns, status_code (nullable),
    status_message, attrs_s/attrs_i/attrs_b/attrs_d (typed maps),
    links array<struct<trace_id,span_id,link_type>>, events
    array<struct<time_ns,desc,eattrs,is_msg,msg_id,msg_type,comp,
    uncomp>>.  Rows with a zero trace or span id are quarantined
    (dropped), mirroring the reference's batch-fatal errors."""
    a_s, a_i = F.col("attrs_s"), F.col("attrs_i")
    a_b, a_d = F.col("attrs_b"), F.col("attrs_d")
    kind = F.lower(F.coalesce(F.col("kind"), F.lit("")))

    kind_tag = _tag(
        kind.isin("client", "server") &
        ~_attr_has(F.lit("span.kind"), a_s, a_i, a_b, a_d),
        "span.kind", "STRING", kind)

    has_status_attr = (_attr_has(F.lit("status.code"), a_s, a_i, a_b, a_d) |
                       _attr_has(F.lit("status.message"),
                                 a_s, a_i, a_b, a_d))
    code = F.col("status_code")
    status_tags = F.concat(
        _tag(code.isNotNull() & ~has_status_attr,
             "status.code", "LONG", code.cast("long")),
        _tag(code.isNotNull() & ~has_status_attr &
             (F.coalesce(F.col("status_message"), F.lit("")) != ""),
             "status.message", "STRING", F.col("status_message")))

    tags_s = _join_tags(
        _map_tags(a_s, "STRING"), _map_tags(a_i, "LONG"),
        _map_tags(a_b, "BOOL", _bool_s), _map_tags(a_d, "DOUBLE"),
        kind_tag, status_tags)

    refs_s = F.when(F.col("links").isNotNull(), F.array_join(
        F.transform(F.col("links"), lambda l: F.concat_ws(
            ",",
            signed64(F.substring(l["trace_id"], 1, 16)).cast("string"),
            signed64(F.substring(l["trace_id"], 17, 16)).cast("string"),
            signed64(l["span_id"]).cast("string"),
            F.when(l["link_type"] == "parent", F.lit("CHILD_OF"))
            .otherwise(F.lit("FOLLOWS_FROM")))), ";")) \
        .otherwise(F.lit(""))

    def _log_line(e):
        ann_fields = F.concat(
            F.when(e["eattrs"].isNotNull(), F.array_sort(F.transform(
                F.map_entries(e["eattrs"]),
                lambda kv: F.concat(kv["key"], F.lit("=STRING:"),
                                    kv["value"])))).otherwise(_empty_arr()),
            F.when(F.coalesce(e["desc"], F.lit("")) != "",
                   F.array(F.concat(F.lit("description=STRING:"),
                                    e["desc"]))).otherwise(_empty_arr()))
        both_zero = (F.coalesce(e["comp"], F.lit(0)) == 0) & \
            (F.coalesce(e["uncomp"], F.lit(0)) == 0)
        msg_fields = F.concat(
            F.array(F.concat(F.lit("message.id=LONG:"),
                             e["msg_id"].cast("string")),
                    F.concat(F.lit("message.type=STRING:"),
                             e["msg_type"])),
            F.when(~both_zero, F.array(
                F.concat(F.lit("message.compressed_size=LONG:"),
                         e["comp"].cast("string")),
                F.concat(F.lit("message.uncompressed_size=LONG:"),
                         e["uncomp"].cast("string")))).otherwise(_empty_arr()))
        return F.concat(
            _us(e["time_ns"]).cast("string"), F.lit("@"),
            F.array_join(F.when(e["is_msg"], msg_fields)
                         .otherwise(ann_fields), ","))

    logs_s = F.when(F.col("events").isNotNull(),
                    F.array_join(F.transform(F.col("events"), _log_line),
                                 ";")).otherwise(F.lit(""))

    start_us = _us(F.col("start_ns"))

    out = spans.withColumn("trace_hi",
                           signed64(F.substring("trace_id", 1, 16))) \
        .withColumn("trace_lo", signed64(F.substring("trace_id", 17, 16))) \
        .withColumn("span_id_s", signed64(F.col("span_id")))
    return (out
            .where((F.col("trace_hi") != 0) | (F.col("trace_lo") != 0))
            .where(F.col("span_id_s") != 0)
            .select(
                "trace_hi", "trace_lo", "span_id_s",
                F.when(F.coalesce(F.col("parent_span_id"),
                                  F.lit("")) != "",
                       signed64(F.col("parent_span_id")))
                .otherwise(F.lit(0).cast("long")).alias("parent_id_s"),
                F.coalesce(F.col("name"), F.lit("")).alias("op_name"),
                start_us.alias("start_us"),
                (_us(F.col("end_ns")) - start_us).alias("duration_us"),
                tags_s.alias("tags_s"),
                refs_s.alias("refs_s"),
                logs_s.alias("logs_s"),
                *[c for c in spans.columns if c.startswith("proc_")
                  or c == "token"]))


def jaeger_process(df: DataFrame) -> DataFrame:
    """ocNodeAndResourceToJaegerProcess (:49-167) as two columns:
    ``service_name`` + ``proc_s`` (sorted serialized tags).  Input
    columns: node_nil boolean, service, hostname, pid, start_sec,
    start_nanos, node_attrs map, language, exporter_version,
    core_lib_version, resource_type, resource_labels map.  A nil node
    short-circuits to unknown-service-name (resource IGNORED); an
    empty service with zero tags yields a NULL process."""
    tags = F.concat(
        _map_tags(F.col("node_attrs"), "STRING"),
        _tag(F.coalesce(F.col("hostname"), F.lit("")) != "",
             "hostname", "STRING", F.col("hostname")),
        _tag(F.coalesce(F.col("pid"), F.lit(0)) != 0,
             "pid", "LONG", F.col("pid").cast("long")),
        _tag(F.coalesce(F.col("start_sec"), F.lit(0)) != 0,
             "start.time", "STRING",
             rfc3339nano(F.col("start_sec"), F.col("start_nanos"))),
        _tag(F.coalesce(F.col("language"), F.lit("")) != "",
             "opencensus.language", "STRING", F.col("language")),
        _tag(F.coalesce(F.col("exporter_version"), F.lit("")) != "",
             "opencensus.exporterversion", "STRING",
             F.col("exporter_version")),
        _tag(F.coalesce(F.col("core_lib_version"), F.lit("")) != "",
             "opencensus.corelibversion", "STRING",
             F.col("core_lib_version")),
        _tag(F.coalesce(F.col("resource_type"), F.lit("")) != "",
             "opencensus.resourcetype", "STRING", F.col("resource_type")),
        _map_tags(F.col("resource_labels"), "STRING"))
    proc_s = F.array_join(F.array_sort(tags), "|")
    service = F.coalesce(F.col("service"), F.lit(""))
    return df.withColumn(
        "proc_service",
        F.when(F.col("node_nil"), F.lit(UNKNOWN_SERVICE))
        .when((service == "") & (proc_s == ""), F.lit(None))
        .otherwise(service)) \
        .withColumn(
        "proc_s",
        F.when(F.col("node_nil"), F.lit(""))
        .when((service == "") & (proc_s == ""), F.lit(None))
        .otherwise(proc_s))


def logzio_spans(spans: DataFrame) -> DataFrame:
    """logzioexporter/exporter.go:104-111: every translated span is
    written with its batch process attached."""
    return jaeger_spans(jaeger_process(spans).withColumnRenamed(
        "proc_service", "proc_service_name"))


def _strip_token_tag(proc_s):
    """sapmexporter/exporter.go:146-166: drop the access-token tag
    from the serialized process tags (order is canonical-sorted here,
    so the swap-with-last trick reduces to a filter)."""
    return F.array_join(
        F.filter(F.split(proc_s, r"\|"),
                 lambda s: ~F.startswith(s, F.lit(SFX_TOKEN_LABEL + "="))),
        "|")


def sapm_batches(spans: DataFrame,
                 access_token_passthrough: bool = True) -> DataFrame:
    """sapmexporter/exporter.go:91-130: batch per the
    com.splunk.signalfx.access_token resource label, token filtered
    from process tags.  Output: one row per (token, process) with the
    span count — a single two-phase aggregate."""
    dd = logzio_spans(spans)
    token = F.coalesce(F.col("token"), F.lit("")) if \
        access_token_passthrough else F.lit("")
    return (dd.select(
        token.alias("access_token"),
        F.col("proc_service_name").alias("service"),
        F.when(F.col("proc_s").isNotNull(),
               _strip_token_tag(F.col("proc_s"))).alias("proc_tags"))
        .groupBy("access_token", "service", "proc_tags")
        .agg(F.count("*").cast("long").alias("n_spans")))
