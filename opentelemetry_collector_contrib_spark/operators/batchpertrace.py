"""batchpertrace analog: split one span batch into one-trace batches.

Reference: /root/reference/pkg/batchpertrace/batchpertrace.go:20-65
(``Split``): for each (ResourceSpans, InstrumentationLibrarySpans)
pair, spans are grouped into one output batch per traceID; batches are
ordered by FIRST APPEARANCE of the traceID within the ILS, the resource
and library metadata are copied onto every batch, and a traceID that
occurs under two different ILS entries lands in two different batches.

Spark-first shape: the "list of single-trace batches" becomes a batch
id column — ``batch_seq`` numbers batches in first-appearance order
within each (resource, library) group, and ``batch_id`` is the full
(resource, library, trace) key a downstream ``write.partitionBy`` or
``groupBy`` consumes to materialize one physical batch per trace.
Plan: ONE shuffle total — the frame is pre-partitioned on the
(resource, lib) group key, which satisfies BOTH window requirements
(the per-batch min(order) needs clustering by (resource, lib, trace),
and hashpartitioning on the coarser group prefix already co-locates
those rows — Spark's subset rule; the dense_rank needs exactly the
group clustering).  The naive chain costs two exchanges: a fine
hash(resource, lib, trace) for the min, then a coarse hash(resource,
lib) for the rank.  The rank's coarse clustering is unavoidable
(first-appearance numbering is a per-group total order), so the fine
exchange is the one to delete.  No per-trace driver loop, no collect;
at 100 TB the batch count is unbounded and never materializes
driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_per_trace(df: DataFrame,
                    resource_cols: list[str] | None = None,
                    lib_cols: list[str] | None = None,
                    trace_col: str = "trace_id",
                    order_col: str = "span_seq") -> DataFrame:
    """Tag each span with its single-trace batch.

    Adds:
    - ``batch_seq``: 1-based batch index in first-appearance order of
      the trace within its (resource, library) group — the position the
      batch would hold in the reference's returned slice
      (batchpertrace.go:36-57 appends on first sight of a traceID);
    - ``batch_id``: the deterministic batch key string.

    ``order_col`` is the within-ILS span position (any monotone column:
    ingest sequence, file offset).  Span order within a batch is the
    caller's sort on it — Split copies spans in input order
    (batchpertrace.go:59-60).
    """
    resource_cols = resource_cols or []
    lib_cols = lib_cols or []
    group = [F.col(c) for c in resource_cols + lib_cols]
    batch_key = group + [F.col(trace_col)]
    if group:
        # one exchange for both windows: hash(group) co-locates every
        # (group, trace) batch AND gives the rank its group clustering
        df = df.repartition(*group)
    # first-appearance position of this trace's batch = min(order) over
    # the batch, ranked within the (resource, lib) group
    w_batch = Window.partitionBy(*batch_key)
    w_group = Window.partitionBy(*group) if group else Window.partitionBy()
    first_seen = F.min(F.col(order_col)).over(w_batch)
    out = (df
           .withColumn("_first_seen", first_seen)
           .withColumn("batch_seq",
                       F.dense_rank().over(w_group.orderBy("_first_seen")))
           .drop("_first_seen"))
    return out.withColumn(
        "batch_id",
        F.concat_ws("/", *[F.col(c).cast("string")
                           for c in resource_cols + lib_cols + [trace_col]]))


def batch_counts(df: DataFrame,
                 resource_cols: list[str] | None = None,
                 lib_cols: list[str] | None = None,
                 trace_col: str = "trace_id") -> DataFrame:
    """One row per output batch (the ``len(result)`` view of Split):
    batch key + span count — a plain partial-aggregated count."""
    resource_cols = resource_cols or []
    lib_cols = lib_cols or []
    keys = resource_cols + lib_cols + [trace_col]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_spans"))
