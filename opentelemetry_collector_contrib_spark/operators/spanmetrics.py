"""spanmetrics — RED metrics from spans: per-dimension call counts and
an explicit-bounds latency histogram.

Reference: processor/spanmetricsprocessor/processor.go:29-56,143-155 —
the processor declares per-(service, operation, kind, status + custom
dimensions) call counts and a latency histogram with explicit bucket
bounds (default 17 buckets with a maxDuration catch-all); the
aggregation bodies are TODO in the snapshot, so this implements the
declared semantics.

Spark-first: bucket assignment is a chained-CASE sum (codegen — no
higher-order function in the per-row path); the histogram assembles as
(dims, bucket) partial counts — the shuffle carries O(dims x buckets)
rows, never raw spans — then zero-fills via a bounded transform on the
tiny bucket axis.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# default explicit bounds (ms) — the 17-bucket ladder shape of
# spanmetricsprocessor's defaultLatencyHistogramBucketsMs
DEFAULT_BOUNDS_MS = [2, 4, 6, 8, 10, 50, 100, 200, 400, 800, 1000,
                     1400, 2000, 5000, 10_000, 15_000]


def bucket_index(duration: Column, bounds: list[float]) -> Column:
    """Index of the histogram bucket for a duration: number of bounds
    strictly below it (last bucket = catch-all > max bound).  A static
    sum of CASE WHENs — whole-stage codegen, O(len(bounds)) per row."""
    idx = F.lit(0)
    for b in bounds:
        idx = idx + F.when(duration > F.lit(float(b)), 1).otherwise(0)
    return idx


def span_metrics(df: DataFrame, dims: list[str],
                 duration_col: str = "duration_ms",
                 bounds: list[float] | None = None) -> DataFrame:
    """Per-dims call count, total duration, and bucket_counts histogram
    (len(bounds)+1 buckets, catch-all last)."""
    bounds = bounds if bounds is not None else DEFAULT_BOUNDS_MS
    nb = len(bounds) + 1
    dur = F.col(duration_col)
    bucketed = df.withColumn("_bucket", bucket_index(dur, bounds))
    per_bucket = (bucketed.groupBy(*dims, "_bucket")
                  .agg(F.count(F.lit(1)).alias("_n")))
    hist = (per_bucket.groupBy(*dims)
            .agg(F.map_from_entries(
                F.collect_list(F.struct("_bucket", "_n"))).alias("_m"))
            .withColumn(
                "bucket_counts",
                F.transform(F.sequence(F.lit(0), F.lit(nb - 1)),
                            lambda i: F.coalesce(
                                F.try_element_at(F.col("_m"), i.cast("int")),
                                F.lit(0).cast("long"))))
            .drop("_m"))
    scalar = (df.groupBy(*dims)
              .agg(F.count(F.lit(1)).alias("call_count"),
                   F.sum(dur).alias("total_duration")))
    return scalar.join(hist, on=dims, how="inner")
