"""Kinesis exporter analog.

Reference semantics (``exporter/kinesisexporter/exporter.go:51-72``):
traces are translated to Jaeger proto batches, a span with no process
inherits the BATCH process (:61-63 — exactly the logzio per-span
process attach, reused here), and each span is handed to the kinesis
producer individually.  The producer-side behavior this analog keeps
(``config.go:31-55`` — the KPL knobs are first-class config):

- ``max_bytes_per_span``: an over-sized span is dropped (quarantined
  here; observable as the input/output row delta);
- spans are routed to a shard by a hash of the trace id (the partition
  key) — the analog hashes the decimal-encoded trace id with md5 so
  DuckDB can replay it; the reference library's shard map is an AWS
  runtime detail, the invariant preserved is "same trace → same
  shard";
- ``max_bytes_per_batch`` / ``aggregate_batch_*``: spans accumulate
  into size-bounded batches per shard.  The KPL flushes greedily on
  overflow; the batch analog assigns a span to batch
  ``floor(preceding_bytes / max_bytes_per_batch)`` over a
  deterministic (start_us, span_id) order — order-deterministic,
  replayable, and one window pass.  A batch may overhang by at most
  one span versus the greedy flush; batching is sequential per shard
  in the reference too, so the per-shard sort IS the semantics.

Scale: one hash-partition shuffle on ``shard`` + an in-partition sort
(window), then a partial-agg rollup — no Python on the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .jaeger import logzio_spans


def span_size(df: DataFrame):
    """Serialized-size stand-in for the Jaeger proto span: payload
    string lengths + 8 bytes per fixed64 field (ids, times)."""
    return (F.length("op_name") + F.length("tags_s") + F.length("refs_s")
            + F.length("logs_s")
            + F.length(F.coalesce(F.col("proc_s"), F.lit("")))
            + F.lit(8 * 6)).cast("long")


def kinesis_batches(spans: DataFrame, num_shards: int = 8,
                    max_bytes_per_span: int = 400,
                    max_bytes_per_batch: int = 4096) -> DataFrame:
    """exporter.go:51-72 + KPL batching: jaeger-translate (process
    attached per span), drop over-sized spans, shard by trace hash,
    pack per-shard batches by byte offset.  Returns one row per
    (shard, batch) with span/byte accounting."""
    jg = logzio_spans(spans)
    sized = jg.select(
        "trace_hi", "trace_lo", "span_id_s", "start_us",
        span_size(jg).alias("nbytes"))
    kept = sized.where(F.col("nbytes") <= max_bytes_per_span)
    shard = F.conv(F.substring(
        F.md5(F.concat_ws(",", F.col("trace_hi"), F.col("trace_lo"))),
        1, 8), 16, 10).cast("long") % num_shards
    w = (Window.partitionBy("shard")
         .orderBy("start_us", "span_id_s")
         .rowsBetween(Window.unboundedPreceding, -1))
    return (kept.withColumn("shard", shard.cast("int"))
            .withColumn("batch",
                        F.floor(F.coalesce(F.sum("nbytes").over(w),
                                           F.lit(0))
                                / max_bytes_per_batch))
            .groupBy("shard", "batch")
            .agg(F.count("*").cast("long").alias("n_spans"),
                 F.sum("nbytes").alias("batch_bytes"),
                 F.min("span_id_s").alias("first_span"),
                 F.max("span_id_s").alias("last_span")))
