"""honeycombexporter analog — spans (+ span events, links) → events.

Reference: ``exporter/honeycombexporter/honeycomb.go`` —

- per span one event (:104-178): resource attrs, then
  ``library.name``/``library.version`` only when non-empty
  (:146-152), then span attrs (record attrs overlay resource on key
  conflict — later AddField wins), the trace-field block (span id,
  trace id, parent id ``omitempty``, name, duration in float
  milliseconds), ``span_kind`` via the 5-kind table with
  ``unspecified`` default (:180-199), ``status.code`` as the raw
  int and ``status.message`` = the message if non-empty else the
  code's enum name (translator.go:53-63; unknown codes render as
  their decimal string, Go's generated enum String());
- per span EVENT a separate honeycomb event (:229-266,
  ``meta.annotation_type`` = ``span_event``): resource attrs as
  underlay, event attrs overlay, parent id = the owning span,
  ``trace.parent_name`` = the owning span's name;
- per span LINK a separate event (:201-227, annotation ``link``):
  link ids + link attrs ONLY — no resource underlay;
- sample rate (:293-304): taken from the configured attribute only
  when the value is int64-TYPED — string-typed values are ignored
  (attrs are modeled as two maps here, ``attrs`` string-valued and
  ``attrs_int`` long-valued, to keep that rule);
- trace ids (ids.go:37-49): 32-hex id collapses to its low 16 hex
  when the high 8 bytes are zero.

Batch shape: three independent projections (spans / events / links)
unioned on a shared flat schema — each input is its own table, so no
branch re-scans another's source.  Attr merges are map upserts; the
merged field map is also serialized sorted (``fields_s``) for
deterministic comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.attributes import merge_maps

SPAN_KINDS = ("client", "server", "producer", "consumer", "internal")
STATUS_NAMES = {0: "STATUS_CODE_UNSET", 1: "STATUS_CODE_OK",
                2: "STATUS_CODE_ERROR"}


def hc_trace_id(col):
    """ids.go:37-49 — drop a zero high half."""
    return F.when(F.substring(col, 1, 16) == F.lit("0" * 16),
                  F.substring(col, 17, 16)).otherwise(col)


def _status_message(code, message):
    named = None
    for c, n in STATUS_NAMES.items():
        w = (code == F.lit(c))
        named = F.when(w, F.lit(n)) if named is None else named.when(w, F.lit(n))
    named = named.otherwise(code.cast("string"))
    return F.when(F.length(F.coalesce(message, F.lit(""))) > 0, message) \
        .otherwise(named)


def _span_kind(kind):
    k = F.lower(F.coalesce(kind, F.lit("")))
    return F.when(k.isin(*SPAN_KINDS), k).otherwise(F.lit("unspecified"))


def _fields_s(m):
    return F.array_join(
        F.transform(F.array_sort(F.map_entries(m)),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ",")


def _sample_rate(attrs_int, attribute: str | None):
    if not attribute:
        return F.lit(None).cast("bigint")
    return F.try_element_at(attrs_int, F.lit(attribute))


_OUT_COLS = ["annotation_type", "trace_id", "span_id", "parent_id", "name",
             "parent_name", "link_trace_id", "link_span_id", "duration_ms",
             "ts_ns", "span_kind", "status_code", "status_message",
             "sample_rate", "fields_s"]


def _ns():
    return F.lit(None).cast("string")


def honeycomb_events(spans: DataFrame,
                     span_events: DataFrame | None = None,
                     links: DataFrame | None = None,
                     sample_rate_attribute: str | None = None) -> DataFrame:
    """spans: (trace_id 32-hex, span_id, parent_span_id nullable, name,
    kind, start_ns, end_ns, status_code int, status_message, attrs
    map<string,string>, attrs_int map<string,long>, resource
    map<string,string>, lib_name, lib_version).
    span_events: (trace_id, span_id, span_name, event_name, ts_ns,
    attrs, attrs_int, resource).  links: (trace_id, span_id,
    link_trace_id, link_span_id, attrs, attrs_int).
    """
    nul_l = F.lit(None).cast("bigint")
    nul_d = F.lit(None).cast("double")

    lib = F.map_filter(
        F.create_map(F.lit("library.name"), F.col("lib_name"),
                     F.lit("library.version"), F.col("lib_version")),
        lambda k, v: v.isNotNull() & (v != ""))
    def with_ints(m):
        # int-typed attrs are fields too (AddField adds every typed
        # value); stringified for the serialized comparison form
        return merge_maps(m, F.transform_values(
            F.col("attrs_int"), lambda k, v: v.cast("string")),
            mode="upsert")

    span_fields = with_ints(merge_maps(
        merge_maps(F.col("resource"), lib, mode="upsert"),
        F.col("attrs"), mode="upsert"))
    out = spans.select(
        _ns().alias("annotation_type"),
        hc_trace_id(F.col("trace_id")).alias("trace_id"),
        F.col("span_id"),
        F.when(F.coalesce(F.col("parent_span_id"), F.lit("")) != "",
               F.col("parent_span_id")).alias("parent_id"),
        F.col("name"), _ns().alias("parent_name"),
        _ns().alias("link_trace_id"), _ns().alias("link_span_id"),
        ((F.col("end_ns") - F.col("start_ns")).cast("double")
         / F.lit(1_000_000.0)).alias("duration_ms"),
        F.col("start_ns").cast("bigint").alias("ts_ns"),
        _span_kind(F.col("kind")).alias("span_kind"),
        F.col("status_code").cast("int").alias("status_code"),
        _status_message(F.col("status_code"),
                        F.col("status_message")).alias("status_message"),
        _sample_rate(F.col("attrs_int"), sample_rate_attribute)
        .alias("sample_rate"),
        _fields_s(span_fields).alias("fields_s"))

    if span_events is not None:
        ev_fields = with_ints(merge_maps(
            F.col("resource"), F.col("attrs"), mode="upsert"))
        out = out.unionByName(span_events.select(
            F.lit("span_event").alias("annotation_type"),
            hc_trace_id(F.col("trace_id")).alias("trace_id"),
            _ns().alias("span_id"),
            F.col("span_id").alias("parent_id"),
            F.col("event_name").alias("name"),
            F.col("span_name").alias("parent_name"),
            _ns().alias("link_trace_id"), _ns().alias("link_span_id"),
            nul_d.alias("duration_ms"),
            F.col("ts_ns").cast("bigint").alias("ts_ns"),
            _ns().alias("span_kind"),
            F.lit(None).cast("int").alias("status_code"),
            _ns().alias("status_message"),
            _sample_rate(F.col("attrs_int"), sample_rate_attribute)
            .alias("sample_rate"),
            _fields_s(ev_fields).alias("fields_s")))

    if links is not None:
        out = out.unionByName(links.select(
            F.lit("link").alias("annotation_type"),
            hc_trace_id(F.col("trace_id")).alias("trace_id"),
            _ns().alias("span_id"),
            F.col("span_id").alias("parent_id"),
            _ns().alias("name"), _ns().alias("parent_name"),
            hc_trace_id(F.col("link_trace_id")).alias("link_trace_id"),
            F.col("link_span_id"),
            nul_d.alias("duration_ms"), nul_l.alias("ts_ns"),
            _ns().alias("span_kind"),
            F.lit(None).cast("int").alias("status_code"),
            _ns().alias("status_message"),
            _sample_rate(F.col("attrs_int"), sample_rate_attribute)
            .alias("sample_rate"),
            _fields_s(with_ints(F.col("attrs"))).alias("fields_s")))

    return out.select(*_OUT_COLS)
