"""Stackdriver (Google Cloud Monitoring/Trace) exporter analog.

Reference semantics:

- ``exporter/stackdriverexporter/resource_mapper.go:27-66`` — the
  configurable resource→MonitoredResource rules engine:

  * mappings are tried IN ORDER; a mapping applies only when the
    resource type equals ``source_type`` AND every non-optional
    ``label_mappings`` source key is present (:29-42, :54-66);
  * a matching mapping emits ``target_type`` plus the renamed labels
    (present optional labels are renamed too, absent ones skipped);
  * when no mapping applies the exporter delegates to the OpenCensus
    library default (:48-50, ``stackdriver.DefaultMapResource``) —
    out of scope here; this analog falls back to the documented
    library terminal default: type ``global`` with no labels.

- ``exporter/stackdriverexporter/spandata.go`` — pdata span → OT
  SpanData translation:

  * span kind (:87-104): UNSPECIFIED and INTERNAL both → ``internal``;
    server/client/producer/consumer map by name; anything else →
    ``unspecified``;
  * status (:106-115): ok → ``ok``, error → ``error``, everything
    else → ``unset``; message passes through (:80-82);
  * attributes (:117-139): RESOURCE attrs are appended first, span
    attrs second, so a span attr wins on key conflict in the
    resulting attribute map; non-scalar (array/map) values are
    dropped;
  * links (:141-155) and events (:157-169) convert ids/names/times
    and their own attrs with an EMPTY resource (``pdata.NewResource()``)
    — resource attrs are NOT merged into link/event attrs;
  * dropped attribute/event/link counts and the instrumentation
    library name/version pass through (:71-79).

Attribute maps serialize as sorted ``key=TYPE:value`` joined by ``|``
(Go map order is not semantic); resource labels as sorted ``key=value``.
All expressions are Catalyst (codegen) — no Python on the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, StringType

GLOBAL_TYPE = "global"


def _empty_arr():
    return F.array().cast(ArrayType(StringType()))


def _has_key(m, key: str):
    return m.isNotNull() & F.array_contains(F.map_keys(m), key)


def map_resource(df: DataFrame, mappings: list[dict],
                 type_col: str = "resource_type",
                 labels_col: str = "resource_labels") -> DataFrame:
    """resource_mapper.go:27-50 — first-match rules engine.

    ``mappings``: [{"source_type", "target_type",
    "label_mappings": [(source_key, target_key, optional), ...]}].
    Adds ``mr_type`` and ``mr_labels`` (sorted ``k=v`` join ``|``).
    The config loop unrolls into one when() chain at plan time.
    """
    rtype, labels = F.col(type_col), F.col(labels_col)
    mr_type = F.lit(GLOBAL_TYPE)
    mr_labels = F.lit("")
    # Build the chain back-to-front so the FIRST mapping wins (:28).
    for m in reversed(mappings):
        applies = rtype == m["source_type"]
        for src, _dst, optional in m["label_mappings"]:
            if not optional:
                applies = applies & _has_key(labels, src)
        out_tags = [
            F.when(_has_key(labels, src),
                   F.array(F.concat(F.lit(dst + "="),
                                    F.element_at(labels, F.lit(src)))))
            .otherwise(_empty_arr())
            for src, dst, _opt in m["label_mappings"]
        ]
        serialized = F.array_join(
            F.array_sort(F.concat(*out_tags)), "|") if out_tags \
            else F.lit("")
        mr_type = F.when(applies, F.lit(m["target_type"])) \
            .otherwise(mr_type)
        mr_labels = F.when(applies, serialized).otherwise(mr_labels)
    return df.withColumn("mr_type", mr_type) \
             .withColumn("mr_labels", mr_labels)


_KIND_MAP = [("unspecified", "internal"), ("internal", "internal"),
             ("server", "server"), ("client", "client"),
             ("producer", "producer"), ("consumer", "consumer")]


def _ot_kind(kind):
    k = F.lower(F.coalesce(kind, F.lit("")))
    out = F.lit("unspecified")
    for src, dst in reversed(_KIND_MAP):
        out = F.when(k == src, F.lit(dst)).otherwise(out)
    return out


def _ot_status(status):
    s = F.lower(F.coalesce(status, F.lit("")))
    return F.when(s == "ok", F.lit("ok")) \
        .when(s == "error", F.lit("error")).otherwise(F.lit("unset"))


def _typed_tags(m, vtype: str, fmt=None):
    fmt = fmt or (lambda v: v.cast("string"))
    return F.when(m.isNotNull(), F.transform(
        F.map_entries(m),
        lambda e: F.concat(e["key"], F.lit(f"={vtype}:"), fmt(e["value"])))
    ).otherwise(_empty_arr())


def _bool_s(v):
    return F.when(v, F.lit("true")).otherwise(F.lit("false"))


def ot_attributes(res_attrs, attrs_s, attrs_i, attrs_b, attrs_d):
    """spandata.go:117-139: resource attrs first, span attrs second —
    span wins on conflict.  The map upsert realizes last-wins; the
    serialized form sorts keys for determinism."""
    span_tags = F.concat(
        _typed_tags(attrs_s, "STRING"), _typed_tags(attrs_i, "LONG"),
        _typed_tags(attrs_b, "BOOL", _bool_s),
        _typed_tags(attrs_d, "DOUBLE"))
    span_keys = F.concat(
        *[F.when(m.isNotNull(), F.map_keys(m)).otherwise(
            _empty_arr().cast("array<string>"))
          for m in (attrs_s, attrs_i, attrs_b, attrs_d)])
    res_tags = F.when(res_attrs.isNotNull(), F.filter(
        F.transform(F.map_entries(res_attrs),
                    lambda e: F.when(
                        F.array_contains(span_keys, e["key"]),
                        F.lit(None)).otherwise(
                        F.concat(e["key"], F.lit("=STRING:"),
                                 e["value"]))),
        lambda s: s.isNotNull())).otherwise(_empty_arr())
    return F.array_join(F.array_sort(F.concat(res_tags, span_tags)), "|")


def ot_spans(spans: DataFrame, mappings: list[dict]) -> DataFrame:
    """spandata.go:46-85 + resource_mapper.go.  Input columns:
    trace_id/span_id/parent_span_id (hex), name, kind, status,
    status_message, start_ns, end_ns, attrs_s/attrs_i/attrs_b/attrs_d,
    resource_type, resource_labels (doubles as resource attrs — the
    OC resource carries one string map), links
    array<struct<trace_id,span_id,attrs:map<string,string>>>, events
    array<struct<name,time_ns,eattrs:map<string,string>>>,
    dropped_attrs/dropped_events/dropped_links, il_name, il_version."""
    res = F.col("resource_labels")
    attrs = ot_attributes(res, F.col("attrs_s"), F.col("attrs_i"),
                          F.col("attrs_b"), F.col("attrs_d"))

    # Links/events: own attrs only, EMPTY resource (:151, :164).
    links_s = F.when(F.col("links").isNotNull(), F.array_join(
        F.transform(F.col("links"), lambda l: F.concat_ws(
            "@", l["trace_id"], l["span_id"],
            F.when(l["attrs"].isNotNull(), F.array_join(F.array_sort(
                F.transform(F.map_entries(l["attrs"]),
                            lambda e: F.concat(e["key"],
                                               F.lit("=STRING:"),
                                               e["value"]))), ","))
            .otherwise(F.lit("")))), ";")).otherwise(F.lit(""))
    events_s = F.when(F.col("events").isNotNull(), F.array_join(
        F.transform(F.col("events"), lambda e: F.concat_ws(
            "@", e["name"], e["time_ns"].cast("string"),
            F.when(e["eattrs"].isNotNull(), F.array_join(F.array_sort(
                F.transform(F.map_entries(e["eattrs"]),
                            lambda kv: F.concat(kv["key"],
                                                F.lit("=STRING:"),
                                                kv["value"]))), ","))
            .otherwise(F.lit("")))), ";")).otherwise(F.lit(""))

    return map_resource(spans, mappings).select(
        F.col("trace_id"), F.col("span_id"),
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parent_id"),
        F.coalesce(F.col("name"), F.lit("")).alias("span_name"),
        _ot_kind(F.col("kind")).alias("ot_kind"),
        F.col("start_ns").alias("start_ns"),
        F.col("end_ns").alias("end_ns"),
        attrs.alias("attrs_s_out"),
        links_s.alias("links_s"),
        events_s.alias("events_s"),
        _ot_status(F.col("status")).alias("ot_status"),
        F.coalesce(F.col("status_message"), F.lit(""))
        .alias("status_message"),
        F.coalesce(F.col("dropped_attrs"), F.lit(0)).cast("int")
        .alias("dropped_attrs"),
        F.coalesce(F.col("dropped_events"), F.lit(0)).cast("int")
        .alias("dropped_events"),
        F.coalesce(F.col("dropped_links"), F.lit(0)).cast("int")
        .alias("dropped_links"),
        F.coalesce(F.col("il_name"), F.lit("")).alias("il_name"),
        F.coalesce(F.col("il_version"), F.lit("")).alias("il_version"),
        F.col("mr_type"), F.col("mr_labels"))
