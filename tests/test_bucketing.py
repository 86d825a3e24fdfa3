"""Bucketed co-located join: both sides pre-bucketed on the join key
join with ZERO exchange (the write-once-shuffle-never-again layout
contract for repeated big-big joins)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sinks.writers import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bt_a", "k", 8, str(tmp_path / "bt_a"))
    write_bucketed(b, "bt_b", "k", 8, str(tmp_path / "bt_b"))
    try:
        j = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # values still correct
        got = j.agg(F.sum(F.col("va") + F.col("vb"))).collect()[0][0]
        assert got == sum(2 * i + 3 * i for i in range(1000))
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_bucketed_groupby_has_no_exchange(spark, tmp_path, no_broadcast):
    a = spark.range(0, 1000).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("v"))
    write_bucketed(a, "bt_g", "k", 8, str(tmp_path / "bt_g"))
    try:
        g = spark.table("bt_g").groupBy("k").agg(F.sum("v").alias("s"))
        plan = g._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert g.count() == 50
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_g")
