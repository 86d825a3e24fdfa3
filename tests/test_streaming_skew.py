"""Skew stress for the stateful streaming operators: a planted hot key
receiving orders of magnitude more rows than its siblings in a single
micro-batch.

What each test pins (docs/SCALE.md "streaming state" rows):

- ``dedup_stream``: the per-key handler folds Arrow chunks into a
  running (count, min) — O(1) working memory per key — so a digest
  with 200k occurrences in one micro-batch costs the same Python-side
  memory as a singleton, and the state entry stays a single long.
- ``group_by_trace_stream(max_spans=...)``: a runaway trace_id is
  released early (``complete=False``) at the cap instead of growing
  one state-store entry without bound — the reference's ring-buffer
  eviction analog (groupbytraceprocessor processor.go:124-170).
"""

import time as _t

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.streaming.dedup_stream import (
    dedup_stream)
from opentelemetry_collector_contrib_spark.streaming.group_by_trace import (
    group_by_trace_stream)

SCHEMA = "doc_id string, digest string"
HOT_N = 200_000


def test_dedup_stream_hot_key(spark, tmp_path):
    """One digest carries 200k rows in one micro-batch (plus two cold
    keys); exactly one survivor row emits, with the exact count and the
    true min doc_id — and a later recurrence is still suppressed."""
    src = str(tmp_path / "hot_in")
    hot = (spark.range(HOT_N)
           .select(F.format_string("h%07d", F.col("id")).alias("doc_id"),
                   F.lit("HOT").alias("digest")))
    cold = spark.createDataFrame(
        [("c1", "COLD1"), ("c2", "COLD2")], SCHEMA)
    hot.unionByName(cold).write.mode("append").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (dedup_stream(stream, key_col="digest", id_col="doc_id")
         .writeStream.format("memory").queryName("skew_dd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # batch 2: the hot key recurs — must NOT re-emit
        (spark.createDataFrame([("h9999999", "HOT")], SCHEMA)
         .coalesce(1).write.mode("append").parquet(src))
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM skew_dd").collect()}
    assert set(rows) == {"HOT", "COLD1", "COLD2"}
    assert rows["HOT"]["survivor_id"] == "h0000000"
    assert rows["HOT"]["n_batch"] == HOT_N
    assert spark.sql("SELECT count(*) c FROM skew_dd").collect()[0]["c"] == 3


def test_group_by_trace_hot_trace_capped(spark, tmp_path):
    """A trace_id receiving 5k spans against a 1k cap releases early
    with complete=False; a normal trace still releases complete=True
    on its wait_duration timer."""
    src = tmp_path / "spans_hot"
    src.mkdir()
    hot = (spark.range(5000)
           .select(F.lit("tHOT").alias("trace_id"),
                   F.format_string("s%05d", F.col("id")).alias("span_id")))
    cold = spark.createDataFrame([("tOK", "x1"), ("tOK", "x2")],
                                 "trace_id string, span_id string")
    hot.unionByName(cold).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema("trace_id string, span_id string")
              .parquet(str(src)))
    out = group_by_trace_stream(stream, wait_duration_ms=1000,
                                max_spans=1000)
    q = (out.writeStream.format("memory").queryName("skew_gbt")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_gbt")).start())
    try:
        deadline = _t.time() + 120
        while _t.time() < deadline:
            if spark.sql("SELECT * FROM skew_gbt").count() >= 2:
                break
            _t.sleep(2)
        got = {r["trace_id"]: r for r in
               spark.sql("SELECT * FROM skew_gbt").collect()}
        # hot trace: released AT the cap boundary, not at 5k — state
        # never held more than max_spans + one micro-batch chunk
        assert got["tHOT"]["complete"] is False
        assert got["tHOT"]["n_spans"] == 5000  # one micro-batch = one call
        assert got["tOK"]["complete"] is True
        assert got["tOK"]["n_spans"] == 2
    finally:
        q.stop()
