"""newrelicexporter analog — spans → New Relic telemetry spans.

Reference: ``exporter/newrelicexporter/transformer.go`` —

- resource attributes plus ``instrumentation.name`` (only when the
  library name is non-empty) and ``instrumentation.version`` (only
  when BOTH name and version are non-empty, :58-72);
- ``SpanAttributes`` (:103-153): ``otel.status_code`` only when the
  status code is not Unset — the enum name with its ``STATUS_CODE_``
  prefix stripped ("OK"/"ERROR"; unknown codes render as their decimal
  string) — and ``otel.status_description`` only when a code is set
  AND the message is non-empty; ``span.kind`` lowercase with the
  ``SPAN_KIND_`` prefix stripped unless UNSPECIFIED; span attributes
  overlay resource attributes; finally ``collector.name`` /
  ``collector.version`` override EVERYTHING (:147-150,
  name="opentelemetry-collector" version="0.0.0", newrelic.go:33-34);
- ``Span`` (:79-101): duration = end - start; spans with an empty
  (invalid) span or trace id error out and are dropped + counted
  (newrelic.go pushTraceData accumulates them as dropped);
- span events pass through as (name, timestamp, attributes) triplets
  (:156-173) — represented here by ``n_events`` plus the caller's own
  event rows (no transformation to mirror).

Batch shape: one Catalyst projection; the merged attribute map is also
serialized sorted (``attrs_s``) for deterministic comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.attributes import merge_maps

COLLECTOR_NAME = "opentelemetry-collector"   # newrelic.go:33
COLLECTOR_VERSION = "0.0.0"                  # newrelic.go:34
STATUS_NAMES = {1: "OK", 2: "ERROR"}         # STATUS_CODE_ stripped

SPAN_KINDS = ("client", "server", "producer", "consumer", "internal")


def newrelic_spans(df: DataFrame) -> DataFrame:
    """Input: trace_id, span_id, parent_span_id (nullable), name, kind
    (lowercase string or null), start_ns, end_ns, status_code int,
    status_message, attrs map<string,string>, resource
    map<string,string>, lib_name, lib_version, n_events int.
    Output: valid spans with duration_ns + sorted ``attrs_s``;
    invalid-id spans are dropped (the error path)."""
    code = F.col("status_code")
    has_code = code != 0                       # Unset = 0
    named = None
    for c, n in STATUS_NAMES.items():
        w = (code == F.lit(c))
        named = F.when(w, F.lit(n)) if named is None \
            else named.when(w, F.lit(n))
    code_str = named.otherwise(code.cast("string"))
    msg = F.coalesce(F.col("status_message"), F.lit(""))
    kind = F.lower(F.coalesce(F.col("kind"), F.lit("")))

    lib_name = F.coalesce(F.col("lib_name"), F.lit(""))
    lib_ver = F.coalesce(F.col("lib_version"), F.lit(""))
    res_plus = merge_maps(
        F.col("resource"),
        F.map_filter(
            F.create_map(
                F.lit("instrumentation.name"),
                F.when(lib_name != "", lib_name),
                F.lit("instrumentation.version"),
                F.when((lib_name != "") & (lib_ver != ""), lib_ver)),
            lambda k, v: v.isNotNull()),
        mode="upsert")
    status_kind = F.map_filter(
        F.create_map(
            F.lit("otel.status_code"), F.when(has_code, code_str),
            F.lit("otel.status_description"),
            F.when(has_code & (msg != ""), msg),
            F.lit("span.kind"),
            F.when(kind.isin(*SPAN_KINDS), kind)),
        lambda k, v: v.isNotNull())
    attrs = merge_maps(
        merge_maps(merge_maps(status_kind, res_plus, mode="upsert"),
                   F.col("attrs"), mode="upsert"),
        F.create_map(F.lit("collector.name"), F.lit(COLLECTOR_NAME),
                     F.lit("collector.version"),
                     F.lit(COLLECTOR_VERSION)),
        mode="upsert")
    attrs_s = F.array_join(
        F.transform(F.array_sort(F.map_entries(attrs)),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"])),
        ",")
    return (df
            .filter((F.coalesce(F.col("span_id"), F.lit("")) != "")
                    & (F.coalesce(F.col("trace_id"), F.lit("")) != ""))
            .select(
                "trace_id", "span_id",
                F.coalesce(F.col("parent_span_id"), F.lit(""))
                .alias("parent_id"),
                "name",
                F.col("start_ns").cast("bigint").alias("ts_ns"),
                (F.col("end_ns") - F.col("start_ns")).cast("bigint")
                .alias("duration_ns"),
                F.col("n_events").cast("int").alias("n_events"),
                attrs_s.alias("attrs_s")))
