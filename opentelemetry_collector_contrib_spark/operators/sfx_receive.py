"""signalfx RECEIVER-side translation (protobuf -> pdata), batch form.

Two translators from ``receiver/signalfxreceiver``:

- datapoints: ``signalfxv2_to_metricdata.go:34-205`` — each SFx
  DataPoint becomes one single-datapoint metric.  The type matrix
  combines the SFx metric type with which datum field is set (the
  DOUBLE arm is checked first in every case):

    GAUGE              -> DoubleGauge / IntGauge
    COUNTER            -> DoubleSum / IntSum, DELTA temporality, monotonic
    CUMULATIVE_COUNTER -> DoubleSum / IntSum, CUMULATIVE, monotonic

  Datapoints with NEITHER datum set are dropped (``errSFxNilDatum``),
  and unknown metric types are dropped — both count toward the
  receiver's dropped-points total rather than erroring the batch.
  Timestamps convert from SFx millis to pdata nanos (``dpTimestamp``,
  ``* 1e6``); dimensions become string labels.

- events: ``signalfxv2_event_to_logdata.go:27-82`` — each SFx Event
  becomes one log record named by its EventType, timestamp ms -> ns.
  The ``com.splunk.signalfx.event_category`` attribute is ALWAYS
  present: the category int when set, else an explicit null marker (the
  unambiguous "this log is an SFx event" tag).  Dimensions flatten into
  attributes; properties keep their protobuf typed-value union by
  picking the first set field in str -> int -> double -> bool order and
  an explicit null when none is set.

Batch shape: both are pure per-row projections — CASE ladders and map
transforms that stay inside whole-stage codegen; no shuffle, no Python.
The wire decode itself (protobuf bytes -> rows) is out of scope (the
receiver's HTTP/gzip plumbing), exactly like the other wire serializers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SFX_EVENT_CATEGORY_KEY = "com.splunk.signalfx.event_category"
SFX_EVENT_PROPERTIES_KEY = "com.splunk.signalfx.event_properties"

_TYPE_MATRIX = {
    # (sfx_type, has_double) -> (data_type, temporality, monotonic)
    ("GAUGE", True): ("DoubleGauge", None, None),
    ("GAUGE", False): ("IntGauge", None, None),
    ("COUNTER", True): ("DoubleSum", "delta", True),
    ("COUNTER", False): ("IntSum", "delta", True),
    ("CUMULATIVE_COUNTER", True): ("DoubleSum", "cumulative", True),
    ("CUMULATIVE_COUNTER", False): ("IntSum", "cumulative", True),
}


def sfx_datapoints_to_metrics(dps: DataFrame) -> DataFrame:
    """SFx v2 datapoints -> one-metric-per-point rows.

    Input: (dp_id, metric, metric_type, int_value nullable,
    double_value nullable, timestamp_ms, dimensions map<string,string>).
    Output keeps only convertible points (the receiver drops the rest):
    (dp_id, name, data_type, temporality, monotonic, ts_ns, value_i,
    value_d, dimensions).
    """
    has_double = F.col("double_value").isNotNull()
    has_int = F.col("int_value").isNotNull()
    # errSFxNilDatum + unknown-type drops (fillInType)
    kept = dps.filter((has_double | has_int) & F.col("metric_type").isin(
        ["GAUGE", "COUNTER", "CUMULATIVE_COUNTER"]))

    def matrix(field: int):
        expr = F.lit(None)
        for (styp, dbl), row in _TYPE_MATRIX.items():
            cond = (F.col("metric_type") == styp) & (has_double == F.lit(dbl))
            expr = F.when(cond, F.lit(row[field])).otherwise(expr)
        return expr

    return kept.select(
        "dp_id",
        F.col("metric").alias("name"),
        matrix(0).alias("data_type"),
        matrix(1).alias("temporality"),
        matrix(2).alias("monotonic"),
        (F.col("timestamp_ms") * F.lit(1000000)).cast("long").alias("ts_ns"),
        # fillIntDataPoint/fillDoubleDataPoint: only the datum matching
        # the chosen type is materialized
        F.when(~has_double, F.col("int_value")).cast("long")
         .alias("value_i"),
        F.when(has_double, F.col("double_value")).cast("double")
         .alias("value_d"),
        "dimensions")


def sfx_events_to_logs(events: DataFrame) -> DataFrame:
    """SFx v2 events -> log-record rows.

    Input: (event_id, event_type, timestamp_ms, category nullable int,
    dimensions map<string,string>, properties
    map<string, struct<str_v:string, int_v:long, double_v:double,
    bool_v:boolean>>).

    Output: (event_id, name, ts_ns, category — null stays null but the
    attribute key is always conceptually present, properties_json —
    typed first-set-field rendering, dimensions).
    """
    prop = (lambda v: F.when(v.getField("str_v").isNotNull(),
                             F.concat(F.lit("s:"), v.getField("str_v")))
            .when(v.getField("int_v").isNotNull(),
                  F.concat(F.lit("i:"),
                           v.getField("int_v").cast("string")))
            .when(v.getField("double_v").isNotNull(),
                  F.concat(F.lit("d:"),
                           v.getField("double_v").cast("string")))
            .when(v.getField("bool_v").isNotNull(),
                  F.concat(F.lit("b:"),
                           v.getField("bool_v").cast("string")))
            .otherwise(F.lit("null")))
    return events.select(
        "event_id",
        F.col("event_type").alias("name"),
        (F.col("timestamp_ms") * F.lit(1000000)).cast("long").alias("ts_ns"),
        F.col("category").cast("long").alias("category"),
        F.transform_values(F.col("properties"),
                           lambda _, v: prop(v)).alias("properties_typed"),
        "dimensions")
