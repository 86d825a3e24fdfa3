"""Incremental streaming exact dedup
(streaming/dedup_stream.py::dedup_stream / streaming_drop_duplicates).

Drives REAL micro-batch boundaries (write -> processAllAvailable ->
write -> processAllAvailable) so the seen-set genuinely crosses
batches through the state store, and a checkpoint-restart case proves
the seen-set survives a query restart — the streaming face of the
offsets/resume manifest contract (plans/manifest.py).
"""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.streaming.dedup_stream import (
    dedup_stream, streaming_drop_duplicates)

SCHEMA = "doc_id string, digest string"


def _write(spark, path, rows):
    (spark.createDataFrame(rows, SCHEMA)
     .coalesce(1).write.mode("append").parquet(path))


def _start(spark, src, ck, name):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    return (dedup_stream(stream, key_col="digest", id_col="doc_id")
            .writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ck)
            .start())


def test_dedup_stream_across_microbatches(spark, tmp_path):
    src = str(tmp_path / "in1")
    _write(spark, src, [("d1", "A"), ("d3", "A"), ("d2", "B")])
    q = _start(spark, src, str(tmp_path / "ck1"), "dd1")
    try:
        q.processAllAvailable()
        # batch 2: A recurs (must NOT re-emit), C is new
        _write(spark, src, [("d4", "A"), ("d5", "C")])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["key"]: r for r in spark.sql("SELECT * FROM dd1").collect()}
    assert set(rows) == {"A", "B", "C"}
    # survivor = min doc_id within the FIRST batch the key appeared in
    assert rows["A"]["survivor_id"] == "d1" and rows["A"]["n_batch"] == 2
    assert rows["B"]["survivor_id"] == "d2"
    assert rows["C"]["survivor_id"] == "d5"
    # exactly one emission per key — the batch-2 'A' was suppressed
    assert spark.sql("SELECT count(*) c FROM dd1").collect()[0]["c"] == 3


def test_dedup_stream_survives_restart(spark, tmp_path):
    """Stop the query, start a NEW one on the same checkpoint: a key
    seen before the restart is still suppressed (state restored)."""
    src = str(tmp_path / "in2")
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out2")

    def start_file_sink():
        # memory sink cannot recover from a checkpoint; the file sink
        # can — it is also the honest production shape
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        return (dedup_stream(stream, key_col="digest", id_col="doc_id")
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ck)
                .outputMode("append")
                .start())

    _write(spark, src, [("d1", "X"), ("d2", "Y")])
    q = start_file_sink()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # arrives while the query is down; replayed on restart
    _write(spark, src, [("d9", "X"), ("d3", "Z")])
    q2 = start_file_sink()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["key"]: r["survivor_id"]
           for r in spark.read.parquet(out).collect()}
    # Z is new after the restart; X must be recognized from the
    # RESTORED seen-set and not re-emitted — exactly one row per key
    assert got == {"X": "d1", "Y": "d2", "Z": "d3"}


def test_dedup_stream_matches_batch_exact_dedup(spark, tmp_path):
    """Survivor set == the batch operator's (md5-keyed min-id groupBy)
    when the same rows flow through in any micro-batch split."""
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        exact_dedup)
    # zero-padded ids: lexicographic min == arrival order, so each
    # key's first-batch survivor is also the batch operator's global
    # min id (every key first appears in rows[:11])
    rows = [(f"d{i:02d}", f"t{i % 7}") for i in range(30)]
    src = str(tmp_path / "in3")
    _write(spark, src, rows[:11])
    q = _start(spark, src, str(tmp_path / "ck3"), "dd3")
    try:
        q.processAllAvailable()
        _write(spark, src, rows[11:])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r["key"], r["survivor_id"]) for r in
           spark.sql("SELECT key, survivor_id FROM dd3").collect()}
    # batch twin keys by md5(text); compare on the raw text key by
    # feeding text as both id and digest source
    batch = exact_dedup(
        spark.createDataFrame(rows, SCHEMA)
        .select("doc_id", F.col("digest").alias("text")), text_col="text")
    want_keep = {r["keep_id"] for r in batch.collect()}
    # same number of distinct keys...
    assert len(got) == batch.count() == 7
    # ...and the streaming survivor for each key is the global min id
    # here because each key's first occurrence IS its min (ids ascend)
    assert {s for _, s in got} == want_keep


def test_streaming_drop_duplicates_builtin(spark, tmp_path):
    src = str(tmp_path / "in4")
    _write(spark, src, [("d1", "A"), ("d2", "A"), ("d3", "B")])
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (streaming_drop_duplicates(stream, ["digest"])
         .writeStream.format("memory").queryName("dd4")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck4"))
         .start())
    try:
        q.processAllAvailable()
        _write(spark, src, [("d4", "A"), ("d5", "C")])
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r["digest"] for r in spark.sql("SELECT digest FROM dd4").collect()}
    assert got == {"A", "B", "C"}
    assert spark.sql("SELECT count(*) c FROM dd4").collect()[0]["c"] == 3
