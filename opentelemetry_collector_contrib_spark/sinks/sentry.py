"""sentryexporter analog — spans → Sentry spans + transactions.

Reference: ``exporter/sentryexporter/sentry_exporter.go`` —

- ``convertToSentrySpan`` (:151-194): per-span op/description via the
  semantic-convention priority chain (``generateSpanDescriptors``
  :202-264: http.method → db.system → rpc.service → messaging.system →
  faas.trigger → fallback), tags = span attributes overlaid by resource
  tags (resource wins, :164-166), ``status_message`` tag only when the
  message is non-empty (:170-172), ``span_kind`` tag unless UNSPECIFIED
  (:174-176), plus ``library_name``/``library_version`` (:178-179);
- ``statusFromSpanStatus`` (:289-297): codes map through
  ``canonicalCodes`` = [unknown, ok, unknown]; out-of-range codes →
  ``unknown`` with message ``error code %d`` (which then lands in the
  ``status_message`` tag);
- transaction assembly (``pushTraceData`` :52-111): a span with empty
  ParentSpanID is a root and starts a transaction; non-roots attach to
  the transaction their parent chain reaches, resolved to a fixed point
  (``classifyAsOrphanSpans`` :132-149 re-scans until no progress since
  span order is arbitrary); spans whose chain never reaches a root
  become their OWN transactions (``generateTransactions`` :114-130) —
  note children of such orphans are themselves orphans (an orphan's
  span id never enters ``idMap``);
- if the whole batch produces no root transaction, everything is
  dropped (:97-99 early return) — mirrored as a batch-global guard;
- ``transactionFromSpan`` (:304-327): the transaction inherits the
  root/orphan span's trace context, op, status, tags, timestamps, and
  uses its description as the transaction name.

Batch shape: conversion is one Catalyst projection.  Assembly groups by
``trace_id`` and resolves parent chains per trace in one
``applyInPandas`` hop — trace groups are tiny (spans of one trace), so
the shuffle is keyed by the natural high-cardinality key.  The
reference resolves chains in one global map; span ids are random 8-byte
strings, so per-trace resolution is the same semantics without the
global state.  The no-root batch guard is a broadcast of a 1-row
aggregate, not a driver collect.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from ..functions.attributes import merge_maps

# sentry_exporter.go:38-42
CANONICAL_CODES = ("unknown", "ok", "unknown")


def span_descriptors(attrs, name, kind):
    """``generateSpanDescriptors`` — returns (op, description) Columns.

    ``attrs`` is a map<string,string> Column; the priority chain and
    outputs mirror sentry_exporter.go:202-264 (pinned by the
    reference's own TestGenerateSpanDescriptors table)."""
    http = F.try_element_at(attrs, F.lit("http.method"))
    db = F.try_element_at(attrs, F.lit("db.system"))
    db_stmt = F.try_element_at(attrs, F.lit("db.statement"))
    rpc = F.try_element_at(attrs, F.lit("rpc.service"))
    msg = F.try_element_at(attrs, F.lit("messaging.system"))
    faas = F.try_element_at(attrs, F.lit("faas.trigger"))
    op = (F.when(http.isNotNull(),
                 F.concat(F.lit("http"),
                          F.when(kind == "client", F.lit(".client"))
                          .when(kind == "server", F.lit(".server"))
                          .otherwise(F.lit(""))))
          .when(db.isNotNull(), F.lit("db"))
          .when(rpc.isNotNull(), F.lit("rpc"))
          .when(msg.isNotNull(), F.lit("message"))
          .when(faas.isNotNull(), faas)
          .otherwise(F.lit("")))
    desc = (F.when(http.isNotNull(), F.concat(http, F.lit(" "), name))
            .when(db.isNotNull(), F.coalesce(db_stmt, name))
            .otherwise(name))
    return op, desc


def convert_spans(df: DataFrame,
                  resource_tags: dict[str, str] | None = None,
                  library_name: str = "",
                  library_version: str = "") -> DataFrame:
    """``convertToSentrySpan`` over span rows.

    Input columns: trace_id, span_id, parent_span_id (null/'' = root),
    name, kind (lowercase SpanKind string or null = UNSPECIFIED),
    start_ns, end_ns, status_code int, status_message string, attrs
    map<string,string> (attribute values already stringified per
    generateTagsFromAttributes).  Output adds: op, description, status,
    tags (map), tags_s (sorted ``k=v`` join — deterministic serialized
    form), and normalizes parent_span_id nulls to ''."""
    kind = F.lower(F.col("kind"))
    op, desc = span_descriptors(F.col("attrs"), F.col("name"), kind)
    code = F.col("status_code")
    in_range = (code >= 0) & (code < len(CANONICAL_CODES))
    status = (F.when(code == 1, F.lit("ok"))
              .otherwise(F.lit("unknown")))
    status = F.when(in_range, status).otherwise(F.lit("unknown"))
    message = (F.when(in_range, F.coalesce(F.col("status_message"),
                                           F.lit("")))
               .otherwise(F.format_string("error code %d", code)))

    extra_keys, extra_vals = [], []
    for k, v in (resource_tags or {}).items():
        extra_keys.append(k)
        extra_vals.append(F.lit(v))
    extra_keys += ["library_name", "library_version"]
    extra_vals += [F.lit(library_name), F.lit(library_version)]
    extras = F.create_map(*[c for kv in zip(
        [F.lit(k) for k in extra_keys], extra_vals) for c in kv])
    # status_message / span_kind tags are conditional (go:170-176)
    extras = F.map_concat(
        extras,
        F.map_filter(
            F.create_map(
                F.lit("status_message"),
                F.when(message != "", message),
                F.lit("span_kind"),
                F.when(kind.isNotNull() & (kind != "unspecified"), kind)),
            lambda k, v: v.isNotNull()))
    tags = merge_maps(F.col("attrs"), extras, mode="upsert")
    tags_s = F.array_join(
        F.transform(F.array_sort(F.map_entries(tags)),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ",")
    return (df
            .withColumn("parent_span_id",
                        F.coalesce(F.col("parent_span_id"), F.lit("")))
            .withColumn("op", op)
            .withColumn("description", desc)
            .withColumn("status", status)
            .withColumn("tags", tags)
            .withColumn("tags_s", tags_s))


_ASSIGN_SCHEMA = T.StructType([
    T.StructField("trace_id", T.StringType()),
    T.StructField("span_id", T.StringType()),
    T.StructField("root_id", T.StringType()),
    T.StructField("role", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("description", T.StringType()),
    T.StructField("status", T.StringType()),
    T.StructField("tags_s", T.StringType()),
    T.StructField("start_ns", T.LongType()),
    T.StructField("end_ns", T.LongType()),
])


def _assign_trace(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-trace chain resolution (pushTraceData:77-94 +
    classifyAsOrphanSpans fixed point).  Order-independent: the root
    set is fixed and attachment reaches the same fixed point whatever
    the scan order."""
    parents = dict(zip(pdf["span_id"], pdf["parent_span_id"]))
    id_map = {sid: sid for sid, p in parents.items() if p == ""}
    pending = [sid for sid in parents if sid not in id_map]
    while True:
        still = []
        for sid in pending:
            root = id_map.get(parents[sid])
            if root is not None:
                id_map[sid] = root
            else:
                still.append(sid)
        if len(still) in (0, len(pending)):
            break
        pending = still
    out = pdf.copy()
    out["root_id"] = [
        id_map.get(s, s) for s in out["span_id"]]          # orphans: own id
    out["role"] = [
        "root" if parents[s] == "" else
        ("child" if s in id_map else "orphan")
        for s in out["span_id"]]
    return out[[f.name for f in _ASSIGN_SCHEMA.fields]]


def sentry_transactions(converted: DataFrame) -> DataFrame:
    """Assemble converted spans into transaction-assigned rows: one row
    per span with (root_id, role).  ``role='root'`` and ``role='orphan'``
    rows each correspond to one Sentry transaction
    (``transactionFromSpan``); ``child`` rows ride inside their root's
    transaction.  An input with no root span anywhere returns zero rows
    (the reference's whole-batch early return, go:97-99)."""
    has_root = converted.agg(
        F.max(F.when(F.col("parent_span_id") == "", 1).otherwise(0))
        .alias("_any_root"))
    assigned = (converted
                .select("trace_id", "span_id", "parent_span_id", "op",
                        "description", "status", "tags_s", "start_ns",
                        "end_ns")
                .groupBy("trace_id")
                .applyInPandas(_assign_trace, _ASSIGN_SCHEMA))
    return (assigned
            .join(F.broadcast(has_root), how="cross")
            .filter(F.col("_any_root") == 1)
            .drop("_any_root"))
