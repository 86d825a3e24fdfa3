"""Streaming count-min sketch
(streaming/stream_pipeline.py::streaming_cms): windowed counters equal
the batch sketch per window, and the cross-window rollup (counter sum
= CMS linearity) answers point queries like the whole-corpus sketch."""

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.sketches import (
    cms_build, cms_merge, cms_query)
from opentelemetry_collector_contrib_spark.streaming.stream_pipeline import (
    streaming_cms)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

ROWS = ([(BASE + dt.timedelta(seconds=s), f"user-{s % 5}")
         for s in range(0, 18)]
        + [(BASE + dt.timedelta(seconds=s), "whale")
           for s in range(2, 24, 3)])


def _sink(spark, tmp_path, name):
    src = str(tmp_path / f"src_{name}")
    (spark.createDataFrame(ROWS, "ts timestamp, uid string")
     .coalesce(1).write.mode("append").parquet(src))
    (spark.createDataFrame(
        [(BASE + dt.timedelta(seconds=900), "zz")],
        "ts timestamp, uid string")
     .coalesce(1).write.mode("append").parquet(src))
    stream = (spark.readStream.schema("ts timestamp, uid string")
              .parquet(src))
    sk = streaming_cms(stream, "uid", window="10 seconds",
                       watermark="20 seconds")
    q = (sk.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name).where(
        F.col("win.start") < BASE + dt.timedelta(seconds=600))


def test_streaming_counters_equal_batch_per_window(spark, tmp_path):
    sunk = _sink(spark, tmp_path, "cms_s1")
    batch = spark.createDataFrame(ROWS, "ts timestamp, uid string") \
        .withColumn("w", F.window("ts", "10 seconds").start)
    want = set()
    for wstart in {r["w"] for r in batch.select("w").distinct().collect()}:
        sub = batch.where(F.col("w") == wstart)
        for r in cms_build(sub, "uid").collect():
            want.add((str(wstart), r["i"], r["pos"], r["cnt"]))
    got = {(str(r["start"]), r["i"], r["pos"], r["cnt"])
           for r in sunk.select(F.col("win.start").alias("start"),
                                "i", "pos", "cnt").collect()}
    assert got == want


def test_rollup_point_queries_match_whole_corpus(spark, tmp_path):
    sunk = _sink(spark, tmp_path, "cms_s2")
    rolled = cms_merge(sunk.select("i", "pos", "cnt"))
    batch = spark.createDataFrame(ROWS, "ts timestamp, uid string")
    probe = batch.select("uid").distinct()
    est_rolled = {r["uid"]: r["cms_est"] for r in
                  cms_query(rolled, probe, "uid").collect()}
    est_whole = {r["uid"]: r["cms_est"] for r in
                 cms_query(cms_build(batch, "uid"), probe, "uid").collect()}
    assert est_rolled == est_whole
    # the overcount-only guarantee holds on the rolled sketch too
    true_counts = {r["uid"]: r["n"] for r in
                   batch.groupBy("uid").agg(F.count(F.lit(1)).alias("n"))
                   .collect()}
    for uid, n in true_counts.items():
        assert est_rolled[uid] >= n
