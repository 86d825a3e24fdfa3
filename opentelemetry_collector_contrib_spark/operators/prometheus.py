"""Prometheus text-exposition parser — the simpleprometheusreceiver
analog (receiver/simpleprometheusreceiver scrapes /metrics and feeds
the prometheus receiver; the wire format is the text exposition:

    metric_name{label="value",...} <value> [<timestamp_ms>]

with ``# HELP`` / ``# TYPE`` comment lines declaring metadata).

Spark-first: pure regexp column expressions; TYPE metadata joins back
onto samples via a broadcast of the tiny (name, type) frame derived
from the same lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SAMPLE_RX = (r"^([a-zA-Z_:][a-zA-Z0-9_:]*)"      # name
              r"(?:\{(.*)\})?"                     # labels blob
              r"\s+(\S+)"                          # value
              r"(?:\s+(\d+))?\s*$")                # optional ts (ms)
_TYPE_RX = r"^# TYPE ([a-zA-Z_:][a-zA-Z0-9_:]*) ([a-z]+)\s*$"


def parse_prometheus(df: DataFrame, line_col: str = "line") -> DataFrame:
    """One row per sample line: metric_name, labels map, value double,
    ts_ms (nullable), metric_type (joined from # TYPE lines, 'untyped'
    when undeclared).  Comment/blank lines drop; malformed sample lines
    are kept flagged (valid=false)."""
    line = F.col(line_col)

    types = (df.filter(line.rlike(_TYPE_RX))
             .select(F.regexp_extract(line, _TYPE_RX, 1).alias("metric_name"),
                     F.regexp_extract(line, _TYPE_RX, 2).alias("metric_type"))
             .dropDuplicates(["metric_name"]))

    samples = df.filter(~line.rlike(r"^\s*(#|$)"))
    name = F.regexp_extract(line, _SAMPLE_RX, 1)
    labels_blob = F.regexp_extract(line, _SAMPLE_RX, 2)
    value_s = F.regexp_extract(line, _SAMPLE_RX, 3)
    ts_s = F.regexp_extract(line, _SAMPLE_RX, 4)
    # label blob: k="v" pairs (quoted values may contain commas via
    # escaping; the exposition escapes \" and \\).  regexp_extract_all
    # with Column patterns avoids SQL-string backslash mangling.
    pair_rx = r'([a-zA-Z_][a-zA-Z0-9_]*)="((?:[^"\\]|\\.)*)"'
    pairs = F.regexp_extract_all(labels_blob, F.lit(pair_rx), F.lit(0))
    labels = F.map_from_entries(F.transform(
        pairs,
        lambda kv: F.struct(
            F.regexp_extract(kv, r'^([a-zA-Z_][a-zA-Z0-9_]*)=', 1).alias("key"),
            F.regexp_replace(
                F.regexp_extract(kv, r'="(.*)"$', 1),
                r'\\(["\\])', "$1").alias("value"))))
    out = (samples
           .withColumn("metric_name", F.when(name != "", name))
           .withColumn("labels", labels)
           .withColumn("value",
                       F.when(value_s == "+Inf", float("inf"))
                       .when(value_s == "-Inf", float("-inf"))
                       .otherwise(value_s.try_cast("double")))
           .withColumn("ts_ms", F.when(ts_s != "", ts_s.try_cast("long")))
           .withColumn("valid",
                       F.col("metric_name").isNotNull()
                       & F.col("value").isNotNull()))
    return (out.join(F.broadcast(types), on="metric_name", how="left")
            .withColumn("metric_type",
                        F.coalesce(F.col("metric_type"), F.lit("untyped"))))
