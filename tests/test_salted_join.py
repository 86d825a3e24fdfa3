"""salted_join: result parity with a plain join under a deliberately
hot key, and the plan spreads the hot key over (key, salt)."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.partitioners import (
    salted_big_side, salted_join)

from conftest import rows


def _frames(spark):
    # 70% of the big side is one hot key
    big = spark.createDataFrame(
        [(i, "hot" if i % 10 < 7 else f"k{i % 10}") for i in range(2000)],
        "row_id long, key string")
    small = spark.createDataFrame(
        [("hot", "H"), ("k7", "A"), ("k8", "B")], "key string, tag string")
    return big, small


def test_salted_join_matches_plain_join(spark):
    big, small = _frames(spark)
    plain = big.join(small, "key")
    salted = salted_join(big, small, "key", salt_buckets=8)
    assert rows(salted, "row_id", "key", "tag") == \
        rows(plain, "row_id", "key", "tag")


def test_salted_join_left_matches_plain_left(spark):
    big, small = _frames(spark)
    plain = big.join(small, "key", "left")
    salted = salted_join(big, small, "key", salt_buckets=8, how="left")
    assert rows(salted, "row_id", "key", "tag") == \
        rows(plain, "row_id", "key", "tag")


def test_salted_join_key_includes_salt(spark):
    big, small = _frames(spark)
    salted = salted_join(big, small, "key", salt_buckets=8)
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan    # the shuffle/join key carries the salt


def test_salted_join_caps_hot_group_size(spark):
    """Quantitative skew bound: the 70%-hot key's 1400 big-side rows
    shuffle as (key, salt) groups, so no single reducer group exceeds
    ~1/8 of them.  Asserts on the operator's OWN pre-drop salted big
    side (salted_big_side — the exact frame salted_join joins on; the
    join output drops _salt and AQE coalescing makes output-partition
    probes unreliable on tiny data), at the same salt_buckets the
    parity tests above use."""
    big, small = _frames(spark)
    b = salted_big_side(big, salt_buckets=8)
    biggest = (b.groupBy("key", "_salt").count()
               .agg(F.max("count")).collect()[0][0])
    # unsalted, the hot reducer group is 1400 rows; salted it is ~175
    assert biggest <= 1400 * 0.25


def test_streaming_exact_dedup_drops_cross_batch_dupes(spark, tmp_path):
    """Exact dedup under Structured Streaming: dropDuplicates keys state
    on doc_id, so a duplicate arriving in a LATER micro-batch is
    dropped too (the streaming twin of datapipe.dedup.exact_dedup)."""
    src = tmp_path / "dd_in"
    src.mkdir()
    spark.createDataFrame([("d1", "x"), ("d2", "y"), ("d1", "x")],
                          "doc_id string, payload string") \
        .coalesce(1).write.mode("append").parquet(str(src))
    stream = (spark.readStream.schema("doc_id string, payload string")
              .parquet(str(src)))
    q = (stream.dropDuplicates(["doc_id"])
         .writeStream.format("memory").queryName("t_sdd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck_sdd")).start())
    try:
        q.processAllAvailable()
        # second batch: one dupe (d2), one new (d3)
        spark.createDataFrame([("d2", "y"), ("d3", "z")],
                              "doc_id string, payload string") \
            .coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        got = sorted(r["doc_id"]
                     for r in spark.sql("SELECT * FROM t_sdd").collect())
        assert got == ["d1", "d2", "d3"]
    finally:
        q.stop()
