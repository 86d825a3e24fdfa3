"""Distributed global prefix sum: value parity with the naive
one-partition window and the no-SinglePartition plan pin."""

import random

from pyspark.sql import Window, functions as F

from opentelemetry_collector_contrib_spark.functions.prefix import global_cumsum

from conftest import rows


def _data(rng, n=500):
    # duplicate sort-key values on purpose: the unique id tiebreak is
    # what makes the total order (and the parity) hold
    return [(i, rng.randrange(0, 20)) for i in range(n)]


def test_global_cumsum_matches_naive_window(spark):
    rng = random.Random(7)
    df = spark.createDataFrame(_data(rng), "id long, v long")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = global_cumsum(df, order, "v", out="cum", num_partitions=8)
    naive = df.withColumn(
        "cum", F.sum("v").over(
            Window.orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert rows(got, "id", "cum") == rows(naive, "id", "cum")


def test_global_cumsum_never_single_partition(spark):
    df = spark.createDataFrame(_data(random.Random(7)), "id long, v long")
    out = global_cumsum(df, [F.col("v").desc(), F.col("id").asc()], "v",
                        num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
    assert "rangepartitioning" in plan


def test_global_cumsum_double_values(spark):
    df = spark.createDataFrame(
        [(i, float(i) / 4) for i in range(100)], "id long, v double")
    got = global_cumsum(df, [F.col("id").asc()], "v", num_partitions=4)
    last = got.orderBy(F.col("id").desc()).limit(1).collect()[0]["cum"]
    assert abs(last - sum(i / 4 for i in range(100))) < 1e-9
