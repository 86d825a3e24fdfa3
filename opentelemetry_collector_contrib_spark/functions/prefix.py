"""Distributed global prefix sum (running total over a TOTAL order).

The naive Spark expression — ``sum(x) OVER (ORDER BY k)`` with no
PARTITION BY — collapses the whole table into ONE window partition:
a single task materializes every row, the textbook 100 TB bottleneck.
This implements the classic two-pass scan instead:

  1. ``repartitionByRange`` on the order key (+ a unique tiebreak, so
     the range partitioning IS the total order), running sum WITHIN
     each partition (spillable, parallel);
  2. per-partition totals — O(#partitions) rows — come to the driver,
     their exclusive prefix is broadcast back, and each row adds its
     partition's offset.

Cost: one range shuffle + one O(partitions) collect + a broadcast
join.  No stage touches more than its own partition's rows, so the
scan parallelizes to any cluster width; the driver handles only one
row per partition (thousands, not trillions).

Ties MUST be broken by the caller-supplied unique tiebreak: equal keys
may straddle a range boundary, and only a total order makes the
running sum engine-reproducible (the DuckDB oracle runs the same
ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_cumsum"]


def global_cumsum(df: DataFrame, order_by: list, value: str,
                  out: str = "cum", num_partitions: int | None = None
                  ) -> DataFrame:
    """Add ``out`` = running sum of ``value`` over the total order
    given by ``order_by`` (a list of Columns/names forming a UNIQUE
    sort key — include a tiebreak)."""
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    d = (df.repartitionByRange(n, *cols)
         .withColumn("_pid", F.spark_partition_id()))
    w_in = (Window.partitionBy("_pid").orderBy(*cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = d.withColumn("_local", F.sum(value).over(w_in))
    # O(#partitions) rows to the driver — the one intentionally tiny
    # collect; every data row stays distributed
    totals = {r["_pid"]: r["_t"] for r in
              (local.groupBy("_pid").agg(F.sum(value).alias("_t"))
               .collect())}
    offset, acc = {}, 0
    for pid in sorted(totals):
        offset[pid] = acc
        acc += totals[pid] or 0
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offset)
                       for x in (pid, offset[pid])]),
        F.col("_pid"))
    return (local.withColumn(out, (F.col("_local") + off_expr)
                             .cast("bigint" if dict(df.dtypes)[value]
                                   in ("bigint", "int", "smallint",
                                       "tinyint") else "double"))
            .drop("_pid", "_local"))
