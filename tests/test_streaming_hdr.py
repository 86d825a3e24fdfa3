"""Streaming HdrHistogram sketch
(streaming/stream_pipeline.py::streaming_hdr_sketch): the windowed
bucket counters equal the batch sketch on punctual data, a late value
past the watermark is dropped, and cross-window rollup is the counter
sum (the merge law, streaming-side)."""

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.hdrsketch import (
    hdr_bucket_py, hdr_quantiles)
from opentelemetry_collector_contrib_spark.streaming.stream_pipeline import (
    streaming_hdr_sketch)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)

ROWS = [
    (BASE + dt.timedelta(seconds=s), "lat", v)
    for s, v in [(1, 0.50), (5, 1.28), (9, 0.50), (15, 20.48), (22, 3.30)]
]


def _write(spark, path, rows):
    (spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
     .coalesce(1).write.mode("append").parquet(path))


def _run(spark, src, tmp_path, name):
    stream = (spark.readStream
              .schema("ts timestamp, event_type string, value double")
              .parquet(src))
    agg = streaming_hdr_sketch(stream, window="10 seconds",
                               watermark="20 seconds")
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT CAST(win.start AS STRING) AS w, event_type, "
                     f"bucket, cnt FROM {name}")


def test_streaming_sketch_equals_batch_buckets(spark, tmp_path):
    src = str(tmp_path / "ev1")
    _write(spark, src, ROWS)
    # push the watermark far past every window so append finalizes them
    _write(spark, src, [(BASE + dt.timedelta(seconds=600), "lat", 1.0)])
    got = {(r["w"], r["bucket"]): r["cnt"]
           for r in _run(spark, src, tmp_path, "hdr1").collect()
           if r["w"] < "2024-01-01 00:10"}
    want: dict[tuple[str, int], int] = {}
    for ts, _, v in ROWS:
        w = ts.replace(second=ts.second // 10 * 10).strftime(
            "%Y-%m-%d %H:%M:%S")
        b = hdr_bucket_py(round(v * 100))
        want[(w, b)] = want.get((w, b), 0) + 1
    assert got == want


def test_late_value_past_watermark_dropped(spark, tmp_path):
    src = str(tmp_path / "ev2")
    _write(spark, src, [(BASE + dt.timedelta(seconds=1), "lat", 0.50)])
    q_name = "hdr2"
    stream = (spark.readStream
              .schema("ts timestamp, event_type string, value double")
              .parquet(src))
    agg = streaming_hdr_sketch(stream, window="10 seconds",
                               watermark="20 seconds")
    q = (agg.writeStream.format("memory").queryName(q_name)
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_hdr2"))
         .start())
    try:
        q.processAllAvailable()
        # advance the watermark past the first window...
        _write(spark, src, [(BASE + dt.timedelta(seconds=120), "lat", 1.0)])
        q.processAllAvailable()
        # ...then a straggler INTO that closed window: must be dropped
        _write(spark, src, [(BASE + dt.timedelta(seconds=2), "lat", 9.99)])
        q.processAllAvailable()
    finally:
        q.stop()
    first = spark.sql(
        "SELECT sum(cnt) AS n FROM hdr2 "
        "WHERE CAST(win.start AS STRING) = '2024-01-01 00:00:00'"
    ).collect()[0]["n"]
    assert first == 1        # the straggler never lands


def test_rollup_is_counter_sum_and_quantiles_read_off(spark, tmp_path):
    """Daily-from-minutely rollup = counter sum over the sunk sketch
    rows; hdr_quantiles then reads percentiles off the rolled sketch
    without touching raw events."""
    src = str(tmp_path / "ev3")
    _write(spark, src, ROWS)
    _write(spark, src, [(BASE + dt.timedelta(seconds=600), "lat", 1.0)])
    # the sentinel's own window never finalizes (nothing advances the
    # watermark past it), so the sunk sketch covers exactly ROWS
    sunk = _run(spark, src, tmp_path, "hdr3")
    rolled = (sunk.groupBy("event_type", "bucket")
              .agg(F.sum("cnt").alias("cnt")))
    row = hdr_quantiles(rolled, [0.5], ["event_type"]).collect()[0]
    vals = sorted(v for _, _, v in ROWS)
    exact = vals[(len(vals) + 1) // 2 - 1] * 100   # nearest-rank, scaled
    assert row["n"] == len(vals)
    assert row["p50"] >= exact
    assert row["p50"] <= exact * (1 + 2 ** -5) + 1
