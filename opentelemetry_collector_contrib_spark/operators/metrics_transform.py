"""metricstransform — combine / label ops / datapoint aggregation.

Reference: processor/metricstransformprocessor —
- ``combine``: regex-match metric names, submatches become new label
  values, group timeseries by label values and points by timestamp
  second, merge with sum/mean/min/max
  (metrics_transform_processor.go:141-186, 224-265;
  datapoint_aggregation.go:34-161);
- distribution merge: bucket-wise count add, sum add, pooled
  sum-of-squared-deviation via the parallel-variance formula
  (datapoint_aggregation.go:165-213);
- label ops: rename metric (regex $1 expansion), add/update/delete
  label, aggregate away labels (metrics_transform_processor.go:298-323).

Spark-first: groupBy + built-in aggs; distribution bucket-count arrays
merge with ``zip_with`` inside ``reduce``-style aggregation (here:
explode-free array sum via aggregate over collect_list is avoided — we
use posexplode + groupBy, which scales: the shuffle carries (key,
bucket_idx) partial sums, never whole arrays).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .regex_parser import java_pattern

_AGGS = {
    "sum": F.sum,
    "mean": F.avg,
    "min": F.min,
    "max": F.max,
}


def combine(df: DataFrame, match_rx: str, new_name: str,
            submatch_labels: list[str] | None = None,
            group_labels: list[str] | None = None,
            agg: str = "sum",
            name_col: str = "metric_name",
            value_col: str = "value",
            ts_col: str = "ts") -> DataFrame:
    """Combine matching metrics into one (metrics_transform_processor.go:224-265).

    - rows whose name doesn't match pass through unchanged (callers
      union them back if needed; we return only the combined frame);
    - ``submatch_labels[i]`` receives regex submatch i+1 of the old name
      (operation_*.go submatch expansion);
    - points grouped by (labels, ts second) then merged with ``agg``
      (datapoint_aggregation.go:34-117; int/double merge 121-161).
    """
    jrx = java_pattern(match_rx)
    matched = df.filter(F.col(name_col).rlike(jrx))
    for i, lbl in enumerate(submatch_labels or []):
        matched = matched.withColumn(
            lbl, F.regexp_extract(F.col(name_col), jrx, i + 1))
    keys = list(submatch_labels or []) + list(group_labels or [])
    # points grouped by timestamp second (datapoint_aggregation.go:44-52)
    ts_sec = (F.col(ts_col).cast("long")).alias("ts_sec")
    agg_fn = _AGGS[agg]
    return (matched
            .groupBy(ts_sec, *keys)
            .agg(agg_fn(F.col(value_col)).alias(value_col))
            .withColumn(name_col, F.lit(new_name)))


def merge_distributions(df: DataFrame, keys: list[str],
                        counts_col: str = "bucket_counts",
                        sum_col: str = "dist_sum",
                        count_col: str = "dist_count",
                        ssd_col: str = "dist_ssd") -> DataFrame:
    """Distribution merge (datapoint_aggregation.go:165-213): bucket-wise
    count add, sum add, count add, pooled sum-of-squared-deviation:

        ssd = ssd_a + ssd_b + n_a*(mu_a - mu)^2 + n_b*(mu_b - mu)^2

    generalized to k-way via the standard parallel-variance identity:
        ssd = sum_i ssd_i + sum_i n_i*mu_i^2 - N*mu^2

    Bucket arrays merge via posexplode + groupBy — the shuffle carries
    (key, bucket_idx, partial count), so arbitrarily many distributions
    merge with bounded memory (no collect_list of arrays).
    """
    scalar = (df.groupBy(*keys)
              .agg(F.sum(count_col).alias(count_col),
                   F.sum(sum_col).alias(sum_col),
                   (F.sum(ssd_col)
                    + F.sum(F.col(count_col)
                            * F.pow(F.col(sum_col) / F.col(count_col), 2))
                    - (F.pow(F.sum(sum_col), 2) / F.sum(count_col))
                    ).alias(ssd_col)))
    buckets = (df.select(*keys, F.posexplode(counts_col)
                         .alias("bucket_idx", "bucket_n"))
               .groupBy(*keys, "bucket_idx")
               .agg(F.sum("bucket_n").alias("bucket_n"))
               .groupBy(*keys)
               .agg(F.array_sort(F.collect_list(
                   F.struct("bucket_idx", "bucket_n"))).alias("_b"))
               .withColumn(counts_col,
                           F.transform(F.col("_b"), lambda s: s.bucket_n))
               .drop("_b"))
    return scalar.join(buckets, on=keys, how="inner")


def rename_metric(df: DataFrame, match_rx: str, template: str,
                  name_col: str = "metric_name") -> DataFrame:
    """Regex rename with $1-style expansion (metrics_transform_processor.go:298-310)."""
    jrx = java_pattern(match_rx)
    return df.withColumn(
        name_col,
        F.when(F.col(name_col).rlike(jrx),
               F.regexp_replace(F.col(name_col), jrx, template))
        .otherwise(F.col(name_col)))


def update_label(df: DataFrame, label: str, value_map: dict[str, str]) -> Column | DataFrame:
    """update/add label value mapping (operation_update_label.go style)."""
    col = F.col(label)
    expr = None
    for old, new in value_map.items():
        cond = col == old
        expr = F.when(cond, new) if expr is None else expr.when(cond, new)
    return df.withColumn(label, expr.otherwise(col) if expr is not None else col)


def aggregate_labels(df: DataFrame, keep_labels: list[str], agg: str,
                     value_col: str = "value",
                     name_col: str = "metric_name",
                     ts_col: str = "ts") -> DataFrame:
    """Aggregate away all labels not in ``keep_labels``
    (metrics_transform_processor.go:311-323)."""
    agg_fn = _AGGS[agg]
    return (df.groupBy(name_col, F.col(ts_col).cast("long").alias("ts_sec"),
                       *keep_labels)
            .agg(agg_fn(value_col).alias(value_col)))


def cumulative_to_delta(df: DataFrame, keys: list[str], time_col: str,
                        value_col: str, tiebreak: str,
                        monotonic: bool = True) -> DataFrame:
    """Cumulative-counter -> per-interval delta with reset detection.

    The collector ecosystem pairs metricstransform with cumulative->
    delta conversion; the semantics here are Prometheus rate()'s reset
    rule: a sample SMALLER than its predecessor means the counter was
    reset, so the whole new value is the delta (the counter restarted
    from 0).  The series' first sample has NULL delta (no predecessor
    — exporters drop or hold it).

    One window over (keys) ordered by (time, tiebreak): a single hash
    shuffle keyed by the series identity, O(1) state per row — the
    shape that survives 10^12 samples (series count is the
    parallelism; hot series are the usual AQE-skew story).
    """
    from pyspark.sql import Window
    w = Window.partitionBy(*keys).orderBy(F.col(time_col).asc(),
                                          F.col(tiebreak).asc())
    prev = F.lag(value_col).over(w)
    raw = F.col(value_col) - prev
    delta = (F.when(prev.isNull(), F.lit(None))
             .when(raw < 0, F.col(value_col)).otherwise(raw)
             if monotonic else raw)
    prev_t = F.lag(time_col).over(w)
    return (df.withColumn("delta", delta)
            .withColumn("dt", F.col(time_col) - prev_t))
