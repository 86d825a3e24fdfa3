"""statsd line parser + flush aggregation.

Reference: receiver/statsdreceiver/protocol/statsd_parser.go —
- line format ``name:value|type[|@rate][|#k:v,...]`` (131-224);
- counter ('c') values scaled by 1/sample_rate (187-195);
- gauge ('g') with '+'/'-' prefix marks a delta (199-210);
- per-flush aggregation (92-129): counters sum, plain gauges
  last-write-wins, delta gauges accumulate onto the last absolute value.

Batch re-expression: the parse is split/regexp_extract (codegen); the
flush aggregation is ``groupBy(name, tags)`` with sum for counters.
Last-write-wins needs an arrival order; batch input carries an explicit
``seq`` ordering column (the stream position), making the semantics
deterministic: gauge value = last absolute value + trailing deltas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_statsd(df: DataFrame, line_col: str = "line") -> DataFrame:
    """statsd_parser.go:131-224 -> columns: name, raw_value string,
    metric_type, sample_rate double, tags string (sorted k=v canon),
    value double (rate-scaled for counters), is_delta bool."""
    line = F.col(line_col)
    name = F.regexp_extract(line, r"^([^:]+):", 1)
    raw = F.regexp_extract(line, r"^[^:]+:([^|]+)\|", 1)
    mtype = F.regexp_extract(line, r"\|(c|g|ms|h|s)(\||$)", 1)
    rate_s = F.regexp_extract(line, r"\|@([0-9.]+)", 1)
    rate = F.when(rate_s != "", rate_s.try_cast("double")).otherwise(F.lit(1.0))
    tags_s = F.regexp_extract(line, r"\|#(.+)$", 1)
    # canonical sorted "k:v,k:v" tag signature (deterministic grouping key,
    # like the sorted field signature in splunk_to_logdata.go:71-75)
    tags = F.when(tags_s != "",
                  F.array_join(F.array_sort(F.split(tags_s, ",")), ","))\
            .otherwise(F.lit(""))
    is_delta = raw.rlike(r"^[+-]")
    value = raw.try_cast("double")   # ANSI-safe: malformed -> NULL
    scaled = F.when(mtype == "c", value / rate).otherwise(value)
    return (df.withColumn("name", name)
              .withColumn("metric_type", mtype)
              .withColumn("sample_rate", rate)
              .withColumn("tags", tags)
              .withColumn("is_delta", is_delta)
              .withColumn("value", scaled)
              # malformed lines flagged (statsd_parser.go:140-151 errors)
              .withColumn("valid", (name != "") & (mtype != "")
                          & scaled.isNotNull()))


def flush_aggregate(parsed: DataFrame, order_col: str | None = None) -> DataFrame:
    """statsd_parser.go:92-129 per-flush aggregation.

    counters: sum of rate-scaled values.
    gauges: last absolute value + deltas after it (with ``order_col``);
    without an order column (pure batch set semantics) gauges use
    sum-of-deltas + max-arrival absolute approximated as: if any
    absolute value exists, latest-by-order else sum of deltas.
    """
    counters = (parsed.filter(F.col("metric_type") == "c")
                .groupBy("name", "tags")
                .agg(F.sum("value").alias("value"))
                .withColumn("metric_type", F.lit("c")))

    gauges = parsed.filter(F.col("metric_type") == "g")
    if order_col:
        w = Window.partitionBy("name", "tags").orderBy(F.col(order_col))
        # last absolute gauge position per key
        gauges = gauges.withColumn(
            "abs_pos",
            F.max(F.when(~F.col("is_delta"), F.col(order_col))).over(
                Window.partitionBy("name", "tags")))
        gauges = (gauges.filter(
                      F.col("abs_pos").isNull()
                      | (F.col(order_col) >= F.col("abs_pos")))
                  .groupBy("name", "tags")
                  .agg(F.sum("value").alias("value")))
    else:
        gauges = (gauges.groupBy("name", "tags")
                  .agg(F.sum(F.when(F.col("is_delta"), F.col("value"))
                             .otherwise(F.lit(0.0))).alias("delta_sum"),
                       F.max(F.when(~F.col("is_delta"), F.col("value")))
                       .alias("last_abs"))
                  .withColumn("value",
                              F.coalesce(F.col("last_abs"), F.lit(0.0))
                              + F.col("delta_sum"))
                  .drop("delta_sum", "last_abs"))
    gauges = gauges.withColumn("metric_type", F.lit("g"))
    return counters.unionByName(gauges)


def timer_aggregate(parsed: DataFrame,
                    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Per-flush timer ('ms') statistics: count, sum, min, max and exact
    interpolated percentiles.  (The reference snapshot only aggregates
    c/g — statsd_parser.go:92-129; timers are the standard statsd
    server behavior, included here for parity with statsd deployments.)

    Exact ``percentile`` (not approx) keeps results engine-portable for
    the DuckDB oracle; at 10^12 scale swap in percentile_approx and
    accept sketch error.
    """
    pct_arr = ", ".join(str(p) for p in percentiles)
    timers = (parsed.filter(F.col("metric_type") == "ms")
              .groupBy("name", "tags")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum("value").alias("sum"),
                   F.min("value").alias("min"),
                   F.max("value").alias("max"),
                   F.expr(f"percentile(value, array({pct_arr}))").alias("_p")))
    for i, p in enumerate(percentiles):
        name = f"p{str(p)[2:]}"
        timers = timers.withColumn(name, F.col("_p").getItem(i))
    return timers.drop("_p")
