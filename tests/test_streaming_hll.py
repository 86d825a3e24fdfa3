"""Streaming HLL registers
(streaming/stream_pipeline.py::streaming_hll_registers): windowed
register maxima equal the batch sketch per window, rollup is
hll_merge's re-max, and the estimate reads off the rolled rows."""

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.sketches import (
    hll_estimate, hll_estimate_from_registers, hll_merge, hll_registers)
from opentelemetry_collector_contrib_spark.streaming.stream_pipeline import (
    streaming_hll_registers)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

ROWS = ([(BASE + dt.timedelta(seconds=s), "click", f"user-{s % 7}")
         for s in range(0, 18)]
        + [(BASE + dt.timedelta(seconds=s), "view", f"user-{s % 3}")
           for s in range(3, 25)])


def _sink(spark, tmp_path, rows, name):
    src = str(tmp_path / f"src_{name}")
    (spark.createDataFrame(rows, "ts timestamp, event_type string, uid string")
     .coalesce(1).write.mode("append").parquet(src))
    # far-future sentinel finalizes every real window in append mode
    (spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=900), "click", "zz")],
        "ts timestamp, event_type string, uid string")
     .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream
              .schema("ts timestamp, event_type string, uid string")
              .parquet(src))
    regs = streaming_hll_registers(stream, "uid", window="10 seconds",
                                   watermark="20 seconds")
    q = (regs.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).where(
        F.col("win.start") < BASE + dt.timedelta(seconds=600))


def test_streaming_registers_equal_batch_per_window(spark, tmp_path):
    sunk = _sink(spark, tmp_path, ROWS, "hll_s1")
    batch = spark.createDataFrame(
        ROWS, "ts timestamp, event_type string, uid string").withColumn(
        "win_start", F.window("ts", "10 seconds").start)
    want = {(str(r["win_start"]), r["event_type"], r["hll_j"], r["mj"])
            for r in hll_registers(batch, "uid", "win_start", "event_type")
            .collect()}
    got = {(str(r["start"]), r["event_type"], r["hll_j"], r["mj"])
           for r in sunk.select(F.col("win.start").alias("start"),
                                "event_type", "hll_j", "mj").collect()}
    assert got == want


def test_rollup_estimate_matches_whole_corpus(spark, tmp_path):
    sunk = _sink(spark, tmp_path, ROWS, "hll_s2")
    rolled = hll_merge(sunk.select("event_type", "hll_j", "mj"))
    est = {r["event_type"]: r["hll_est"] for r in
           hll_estimate_from_registers(rolled, "event_type").collect()}
    batch = spark.createDataFrame(
        ROWS, "ts timestamp, event_type string, uid string")
    want = {r["event_type"]: r["hll_est"] for r in
            hll_estimate(batch, "uid", "event_type").collect()}
    assert est == want
