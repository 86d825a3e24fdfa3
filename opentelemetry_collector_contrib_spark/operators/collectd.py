"""collectd JSON receiver — write_http payloads to flat metric rows.

Reference: receiver/collectdreceiver/collectd.go —
- payload is a JSON ARRAY of records with parallel ``dsnames``/
  ``dstypes``/``values`` arrays (collectd.go:34-48);
- a record with time+severity+message is an EVENT, skipped from the
  metric path (collectd.go:50-52, 64-68);
- per ds-index metric name = ``type[.type_instance][.dsname]`` — the
  dsname part only when there is more than one ds, otherwise dsname
  becomes a label (getReasonableMetricName, collectd.go:161-184);
- ``type_instance`` may embed dimensions ``name[k=v,...]-rest`` which
  are extracted into labels, existing label keys win
  (LabelsFromName/pointTypeInstance, collectd.go:187-240);
- dstype counter/derive -> cumulative, gauge/absolute (and unknown) ->
  gauge (collectd.go:119-136); int-parseable values are int64 points,
  else double (newPoint, collectd.go:138-156).

Spark-first: one from_json + two explodes (records, ds index); name and
label extraction are regexp/map expressions; everything ANSI-safe.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RECORD_DDL = ("array<struct<dsnames: array<string>, dstypes: array<string>, "
              "host: string, interval: double, plugin: string, "
              "plugin_instance: string, time: double, type: string, "
              "type_instance: string, values: array<string>, "
              "message: string, severity: string>>")

_BRACKET_RX = r"\[([^\]]*)\]"


def _labels_from_name(col: Column) -> tuple[Column, Column]:
    """LabelsFromName (collectd.go:213-240): returns (cleaned name,
    map of extracted dims).  Malformed bracket contents fall back to
    the raw name with no dims, like the reference."""
    dims_s = F.regexp_extract(col, _BRACKET_RX, 1)
    cleaned = F.regexp_replace(col, _BRACKET_RX, "")
    pairs = F.filter(F.split(dims_s, ","), lambda kv: kv.contains("="))
    dims = F.map_from_entries(F.transform(pairs, lambda kv: F.struct(
        F.split_part(kv, F.lit("="), F.lit(1)).alias("key"),
        F.split_part(kv, F.lit("="), F.lit(2)).alias("value"))))
    # reference bails out entirely when any segment lacks '='
    ok = F.size(F.filter(F.split(dims_s, ","),
                         lambda kv: ~kv.contains("="))) == 0
    name = F.when((dims_s == "") | ~ok, col).otherwise(cleaned)
    dims = F.when((dims_s == "") | ~ok,
                  F.map_from_entries(F.array().cast(
                      "array<struct<key:string,value:string>>"))
                  ).otherwise(dims)
    return name, dims


def parse_collectd(df: DataFrame, json_col: str = "body") -> DataFrame:
    """Explode collectd JSON payloads into one row per (record, ds).

    Output: metric_name, value double, is_double, metric_type, ts_ns,
    host, plugin, dsname label handling and extracted dims per the
    reference rules.  Events are excluded (they carry no datapoints).
    """
    rec = F.explode(F.from_json(F.col(json_col), RECORD_DDL)).alias("r")
    df = df.select(rec)
    r = F.col("r")
    is_event = (r.time.isNotNull() & r.severity.isNotNull()
                & r.message.isNotNull())
    df = df.filter(~is_event)
    df = df.select(
        "r", F.posexplode(F.coalesce(r.dsnames, F.array())).alias("i", "dsname"))
    r = F.col("r")
    val_s = F.col("r").values.getItem(F.col("i"))
    ti_name, ti_dims = _labels_from_name(F.coalesce(r.type_instance, F.lit("")))
    multi_ds = F.size(r.dsnames) > 1
    name = F.concat_ws(
        ".",
        F.when(r.type != "", r.type),
        F.when(ti_name != "", ti_name),
        F.when(multi_ds & (F.col("dsname") != ""), F.col("dsname")))
    dstype = F.col("r").dstypes.getItem(F.col("i"))
    out = (df
           .withColumn("metric_name", name)
           .withColumn("value", val_s.try_cast("double"))
           .withColumn("is_double", ~val_s.rlike(r"^-?\d+$"))
           .withColumn("metric_type",
                       F.when(dstype.isin("counter", "derive"), "cumulative")
                       .otherwise("gauge"))
           .withColumn("ts_ns", (r.time * F.lit(1e9)).try_cast("long"))
           .withColumn("host", r.host)
           .withColumn("plugin", r.plugin)
           .withColumn("plugin_instance", r.plugin_instance)
           .withColumn("dsname_label",
                       F.when(~multi_ds, F.col("dsname")))
           .withColumn("extracted_dims", ti_dims)
           .filter(val_s.isNotNull()))
    return out.drop("r", "i")
