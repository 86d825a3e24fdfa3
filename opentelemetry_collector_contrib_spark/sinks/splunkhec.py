"""splunkhecexporter analog — logs / metric datapoints / spans → HEC events.

Reference: ``exporter/splunkhecexporter/`` —

- logs (logdata_to_splunk.go:43-73): host = ``host.name`` attr (default
  "unknown"), source = ``service.name``, sourcetype =
  ``com.splunk.sourcetype``, index = ``com.splunk.index`` — these four
  keys are routed to the envelope and EXCLUDED from fields; every other
  attribute becomes a typed field; event = the body; Time = ns rounded
  to millisecond precision, rendered in seconds, omitted when the
  timestamp is zero (:107-119);
- metrics (metricdata_to_splunk.go:42-233): the same four envelope
  attrs but resource attrs are ALSO all copied into the common fields
  (:68-74 — unlike the log path); per gauge/sum datapoint one event
  with field ``metric_name:<name>`` = value; per histogram datapoint a
  ``<name>_sum`` event, a ``<name>_count`` event, then one CUMULATIVE
  bucket event per explicit bound with ``le`` = Go %g of the bound,
  plus a ``+Inf`` bucket adding the overflow count (:104-150); bucket
  events are skipped entirely when counts is empty or
  len(counts) != len(bounds)+1 (:127); labels overlay the cloned
  common fields (:248-252); Event = the literal string "metric"
  (internal/splunk/common.go:29);
- traces (tracedata_to_splunk.go:62-173): one event per span, Fields =
  the stringified resource attrs, Event = the HecSpan struct (ids via
  HexString, Kind().String() / Status Code().String() enum names,
  events and links carried in order with their attributes).

Batch shape: one projection per input row building an ARRAY of event
structs, then a single explode — no per-event branch re-scans the
input.  The ``fields`` map is serialized sorted (``fields_s``) for
deterministic comparison; ``sinks/serializers.py`` handles wire JSON.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.attributes import merge_maps

UNKNOWN_HOST = "unknown"
_SPECIAL = ("host.name", "service.name", "com.splunk.sourcetype",
            "com.splunk.index")

SPAN_KIND_NAMES = {"unspecified": "SPAN_KIND_UNSPECIFIED",
                   "internal": "SPAN_KIND_INTERNAL",
                   "server": "SPAN_KIND_SERVER",
                   "client": "SPAN_KIND_CLIENT",
                   "producer": "SPAN_KIND_PRODUCER",
                   "consumer": "SPAN_KIND_CONSUMER"}
STATUS_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK",
                2: "STATUS_CODE_ERROR"}


def hec_time(ns_col):
    """nanoTimestampToEpochMilliseconds / timestampToSeconds... — both
    reduce to round-half-away(ns/1e6)/1e3 seconds, nil when ts == 0."""
    return F.when(ns_col != 0,
                  F.round(ns_col / F.lit(1_000_000.0), 0) / F.lit(1000.0))


def g_format(dbl):
    """Go strconv.FormatFloat(f, 'g', -1, 64) for the non-exponent
    range the bucket bounds live in: integral values drop the '.0'."""
    return F.regexp_replace(dbl.cast("string"), r"\.0$", "")


def _serialize(m):
    return F.array_join(
        F.transform(F.array_sort(F.map_entries(m)),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"])), ",")


def _stringify_typed(attrs, attrs_int, attrs_bool):
    """Typed attr maps → one string-valued map (JSON-scalar rendering)."""
    return F.map_concat(
        attrs,
        F.transform_values(attrs_int, lambda k, v: v.cast("string")),
        F.transform_values(attrs_bool,
                           lambda k, v: F.when(v, "true").otherwise("false")))


def _envelope(attr_map, source: str, sourcetype: str, index: str):
    def pick(key, default):
        v = F.try_element_at(attr_map, F.lit(key))
        return F.coalesce(v, F.lit(default))
    return (pick("host.name", UNKNOWN_HOST).alias("host"),
            pick("service.name", source).alias("source"),
            pick("com.splunk.sourcetype", sourcetype).alias("sourcetype"),
            pick("com.splunk.index", index).alias("index"))


def hec_log_events(logs: DataFrame, source: str = "", sourcetype: str = "",
                   index: str = "") -> DataFrame:
    """Log records → HEC events.  Input: ts_ns, body, attrs
    (map<string,string>), attrs_int, attrs_bool."""
    fields = _stringify_typed(
        F.map_filter(F.col("attrs"), lambda k, v: ~k.isin(*_SPECIAL)),
        F.col("attrs_int"), F.col("attrs_bool"))
    return logs.select(
        hec_time(F.col("ts_ns")).alias("time"),
        *_envelope(F.col("attrs"), source, sourcetype, index),
        F.col("body").alias("event"),
        _serialize(fields).alias("fields_s"))


def hec_metric_events(points: DataFrame, source: str = "",
                      sourcetype: str = "", index: str = "") -> DataFrame:
    """Metric datapoints → HEC metric events.  Input: name, mtype
    ('int_gauge'|'double_gauge'|'int_sum'|'double_sum'|'histogram'),
    ts_ns, ival (long), dval (double), hsum (double), hcount (long),
    bounds (array<double>), counts (array<long>), labels
    (map<string,string>), resource (map<string,string>)."""
    mkey = F.concat(F.lit("metric_name:"), F.col("name"))
    val = F.when(F.col("mtype").isin("int_gauge", "int_sum"),
                 F.col("ival").cast("string")) \
        .otherwise(F.col("dval").cast("string"))
    scalar = F.array(F.struct(mkey.alias("k"), val.alias("v"),
                              F.lit(None).cast("string").alias("le")))
    nb = F.size(F.col("bounds"))
    counts_ok = (F.size(F.col("counts")) == nb + 1) & (F.size(F.col("counts")) > 0)
    no_le = F.lit(None).cast("string")
    sum_ev = F.struct(F.concat(mkey, F.lit("_sum")).alias("k"),
                      F.col("hsum").cast("string").alias("v"),
                      no_le.alias("le"))
    count_ev = F.struct(F.concat(mkey, F.lit("_count")).alias("k"),
                        F.col("hcount").cast("string").alias("v"),
                        no_le.alias("le"))
    # cumulative bucket i (1-based): sum(counts[1..i]), le = %g bound
    buckets = F.transform(F.sequence(F.lit(1), nb),
                          lambda i: F.struct(
                              F.concat(mkey, F.lit("_bucket")).alias("k"),
                              F.aggregate(F.slice(F.col("counts"), F.lit(1), i),
                                          F.lit(0).cast("long"),
                                          lambda acc, x: acc + x)
                              .cast("string").alias("v"),
                              g_format(F.element_at(F.col("bounds"),
                                                    i.cast("int"))).alias("le")))
    inf_ev = F.struct(
        F.concat(mkey, F.lit("_bucket")).alias("k"),
        F.aggregate(F.col("counts"), F.lit(0).cast("long"),
                    lambda acc, x: acc + x).cast("string").alias("v"),
        F.lit("+Inf").alias("le"))
    # sequence(1, 0) would generate a DEScending [1,0] — guard nb == 0
    # (zero bounds + one count still emits the +Inf bucket, :141-149)
    empty_ev = F.filter(scalar, lambda s: F.lit(False))
    hist = F.when(counts_ok,
                  F.concat(F.array(sum_ev, count_ev),
                           F.when(nb > 0, buckets).otherwise(empty_ev),
                           F.array(inf_ev))) \
        .otherwise(F.array(sum_ev, count_ev))
    events = F.when(F.col("mtype") == "histogram", hist).otherwise(scalar)

    common = merge_maps(F.col("resource"), F.col("labels"), mode="upsert")
    exploded = points.select(
        hec_time(F.col("ts_ns")).alias("time"),
        *_envelope(F.col("resource"), source, sourcetype, index),
        common.alias("_common"),
        F.explode(events).alias("_ev"))
    fields = merge_maps(
        F.col("_common"),
        F.map_concat(
            F.create_map(F.col("_ev.k"), F.col("_ev.v")),
            F.when(F.col("_ev.le").isNotNull(),
                   F.create_map(F.lit("le"), F.col("_ev.le")))
            .otherwise(F.expr("cast(map() as map<string,string>)"))),
        mode="upsert")
    return exploded.select(
        "time", "host", "source", "sourcetype", "index",
        F.lit("metric").alias("event"),
        _serialize(fields).alias("fields_s"))


def _enum(col, table: dict, default=None):
    out = None
    for k, name in table.items():
        w = (col == F.lit(k))
        out = F.when(w, F.lit(name)) if out is None else out.when(w, F.lit(name))
    return out.otherwise(default if default is not None
                         else col.cast("string"))


def hec_span_events(spans: DataFrame, source: str = "", sourcetype: str = "",
                    index: str = "") -> DataFrame:
    """Spans → HEC events with the HecSpan payload flattened.  Input:
    trace_id, span_id, parent_span_id, name, kind (lowercase), start_ns,
    end_ns, status_code, status_message, attrs (map<string,string>),
    resource (map<string,string>), events (array<struct<name,ts_ns,
    attrs_s>>), links (array<struct<trace_id,span_id,state,attrs_s>>)."""
    ev_s = F.array_join(
        F.transform(F.col("events"),
                    lambda e: F.concat(e["name"], F.lit("@"),
                                       e["ts_ns"].cast("string"), F.lit("{"),
                                       e["attrs_s"], F.lit("}"))), "|")
    lk_s = F.array_join(
        F.transform(F.col("links"),
                    lambda l: F.concat(l["trace_id"], F.lit("/"),
                                       l["span_id"], F.lit("/"), l["state"],
                                       F.lit("{"), l["attrs_s"], F.lit("}"))),
        "|")
    return spans.select(
        hec_time(F.col("start_ns")).alias("time"),
        *_envelope(F.col("resource"), source, sourcetype, index),
        _serialize(F.col("resource")).alias("fields_s"),
        F.col("trace_id"), F.col("span_id"),
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parent_span"),
        F.col("name"),
        _enum(F.lower(F.col("kind")),
              {k: v for k, v in SPAN_KIND_NAMES.items()},
              default=F.lit("SPAN_KIND_UNSPECIFIED")).alias("kind_s"),
        _enum(F.col("status_code"), STATUS_NAMES).alias("status_code_s"),
        F.col("status_message"),
        F.col("start_ns"), F.col("end_ns"),
        _serialize(F.col("attrs")).alias("attrs_s"),
        ev_s.alias("events_s"), lk_s.alias("links_s"))
