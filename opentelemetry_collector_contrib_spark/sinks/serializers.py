"""Protocol serializers — the exporter-side inverses of the line
parsers (carbonexporter / splunkhecexporter analogs).

Round-trip law (property-tested): parse(serialize(x)) == x for the
carbon plaintext and HEC event shapes.  Serialization is pure column
expressions (to_json/concat), so per-sink payload rendering rides the
same codegen stage as the rest of the write branch.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_carbon_line(path: Column, tags: Column, value: Column,
                   ts: Column) -> Column:
    """``<path>[;k=v...] <value> <ts>`` (carbonexporter; the exact
    inverse of carbon.parse_plaintext).  Tags render sorted by key for
    a deterministic line."""
    entries = F.map_entries(tags)
    kvs = F.transform(
        F.array_sort(entries, lambda a, b: F.when(a.key < b.key, -1)
                     .when(a.key > b.key, 1).otherwise(0)),
        lambda e: F.concat(e.key, F.lit("="), e.value))
    tagged = F.when(F.size(entries) > 0,
                    F.concat(path, F.lit(";"), F.array_join(kvs, ";"))
                    ).otherwise(path)
    return F.concat_ws(" ", tagged, value.cast("string"), ts.cast("string"))


def to_hec_event(time_s: Column, host: Column, source: Column,
                 sourcetype: Column, index: Column, event: Column,
                 fields: Column) -> Column:
    """Splunk HEC event JSON (splunkhecexporter shape; parseable by
    json_parser.splunk_hec_events)."""
    return F.to_json(F.struct(
        time_s.alias("time"), host.alias("host"), source.alias("source"),
        sourcetype.alias("sourcetype"), index.alias("index"),
        event.alias("event"), fields.alias("fields")))


def to_statsd_line(name: Column, value: Column, metric_type: Column,
                   sample_rate: Column | None = None,
                   tags: Column | None = None) -> Column:
    """``name:value|type[|@rate][|#k:v,...]`` (statsd wire format)."""
    base = F.concat(name, F.lit(":"), value.cast("string"),
                    F.lit("|"), metric_type)
    if sample_rate is not None:
        base = F.when(sample_rate.isNotNull() & (sample_rate != 1.0),
                      F.concat(base, F.lit("|@"),
                               sample_rate.cast("string"))).otherwise(base)
    if tags is not None:
        base = F.when(tags.isNotNull() & (tags != ""),
                      F.concat(base, F.lit("|#"), tags)).otherwise(base)
    return base
