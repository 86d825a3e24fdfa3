"""Streaming statsd flush with watermark late-data drop
(streaming/stream_pipeline.py::streaming_statsd_flush).

The late-data test drives TWO micro-batches so the watermark actually
advances between them — the only way to observe Spark dropping a
late row (a single processAllAvailable over one file never drops
anything, which is why the other streaming tests can't cover this).
"""

import datetime as dt

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.streaming.stream_pipeline import (
    streaming_statsd_flush)

BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write(spark, path, rows):
    (spark.createDataFrame(rows, "ts timestamp, line string")
     .coalesce(1).write.mode("append").parquet(path))


def _start(spark, src, tmp_path, name):
    stream = (spark.readStream.schema("ts timestamp, line string")
              .parquet(src))
    agg = streaming_statsd_flush(stream, flush_interval="10 seconds",
                                 watermark="30 seconds")
    return (agg.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
            .start())


def test_counter_flush_windows_sum(spark, tmp_path):
    src = str(tmp_path / "lines1")
    _write(spark, src, [
        (BASE + dt.timedelta(seconds=1), "hits:3|c"),
        (BASE + dt.timedelta(seconds=4), "hits:2|c|@0.5"),   # -> 4.0
        (BASE + dt.timedelta(seconds=12), "hits:5|c"),       # next window
        (BASE + dt.timedelta(seconds=2), "temp:70|g"),       # gauge: not this path
        (BASE + dt.timedelta(seconds=3), "garbage"),         # invalid: dropped
    ])
    # a far-future row pushes the watermark past both windows so append
    # mode finalizes them
    _write(spark, src, [(BASE + dt.timedelta(seconds=300), "hits:1|c")])
    q = _start(spark, src, tmp_path, "flush1")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["start_s"], r["value"], r["n_lines"]) for r in spark.sql(
        "SELECT CAST(flush.start AS STRING) AS start_s, value, n_lines "
        "FROM flush1 WHERE name = 'hits'").collect()}
    assert ("2024-01-01 00:00:00", 7.0, 2) in got   # 3 + 2/0.5
    assert ("2024-01-01 00:00:10", 5.0, 1) in got


def test_late_line_past_watermark_is_dropped(spark, tmp_path):
    src = str(tmp_path / "lines2")
    # batch 1: window [0,10) gets 3, and a t=+100s row advances the
    # max event time so the committed watermark becomes 100-30 = +70s
    _write(spark, src, [
        (BASE + dt.timedelta(seconds=1), "hits:3|c"),
        (BASE + dt.timedelta(seconds=100), "hits:9|c"),
    ])
    q = _start(spark, src, tmp_path, "flush2")
    try:
        q.processAllAvailable()
        # batch 2: a LATE line for the [0,10) window — its event time
        # (+2s) is far behind the +70s watermark, so Spark drops it
        # before aggregation; the window finalizes WITHOUT it
        _write(spark, src, [
            (BASE + dt.timedelta(seconds=2), "hits:100|c"),
            (BASE + dt.timedelta(seconds=130), "hits:1|c"),
        ])
        q.processAllAvailable()
    finally:
        q.stop()
    vals = {r["start_s"]: r["value"] for r in spark.sql(
        "SELECT CAST(flush.start AS STRING) AS start_s, value "
        "FROM flush2").collect()}
    # the finalized first window sums to 3 — the late 100 never lands
    assert vals.get("2024-01-01 00:00:00") == 3.0


def test_streaming_matches_batch_on_punctual_data(spark, tmp_path):
    """On data with no late arrivals the streaming flush equals the
    batch groupBy — the micro-batch boundary is invisible."""
    rows = [(BASE + dt.timedelta(seconds=s), f"m{s % 3}:{s}|c")
            for s in range(0, 25)]
    src = str(tmp_path / "lines3")
    _write(spark, src, rows)
    _write(spark, src, [(BASE + dt.timedelta(seconds=400), "late_kick:1|c")])
    q = _start(spark, src, tmp_path, "flush3")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["start_s"], r["name"], r["value"]) for r in spark.sql(
        "SELECT CAST(flush.start AS STRING) AS start_s, name, value "
        "FROM flush3 WHERE name LIKE 'm%'").collect()}
    batch = streaming_statsd_flush(
        spark.createDataFrame(rows, "ts timestamp, line string"))
    want = {(str(r["flush"]["start"]), r["name"], r["value"])
            for r in batch.collect()}
    assert got == want
