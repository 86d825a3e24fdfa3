"""Combiner-style top-k (functions/topk.py): window-twin equality
under many partitions, tie determinism, shuffle-volume plan shape,
and the bounded-state re-reduce."""

import numpy as np
from pyspark.sql import Window
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.topk import (
    topk_per_group)

from conftest import rows


def _df(spark, n=5000, parts=16):
    rng = np.random.default_rng(9)
    data = [(int(i), f"g{int(i) % 7}", int(v))
            for i, v in enumerate(rng.integers(0, 1000, size=n))]
    return spark.createDataFrame(
        data, "id long, grp string, score long").repartition(parts)


def test_matches_window_twin_both_directions(spark):
    df = _df(spark)
    for asc in (False, True):
        got = rows(topk_per_group(df, ["grp"], "score", "id", 5,
                                  ascending=asc))
        order = [F.col("score").asc() if asc else F.col("score").desc(),
                 F.col("id").asc()]
        win = Window.partitionBy("grp").orderBy(*order)
        want = rows(df.withColumn("r", F.row_number().over(win))
                    .filter(F.col("r") <= 5).drop("r"))
        assert got == want


def test_tie_break_is_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "g", 100) for i in range(20)], "id long, grp string, score long"
    ).repartition(8)
    got = rows(topk_per_group(df, ["grp"], "score", "id", 3), "id")
    assert got == [(0,), (1,), (2,)]     # all-tied -> smallest ids


def test_k_exceeds_group(spark):
    df = spark.createDataFrame([(1, "g", 5), (2, "g", 7)],
                               "id long, grp string, score long")
    assert topk_per_group(df, ["grp"], "score", "id", 10).count() == 2


def test_prereduce_bounds_exchange(spark):
    """The rows entering the final window must be <= parts*groups*k,
    not the input size — check via the pre-reduce stage's count."""
    df = _df(spark, n=20000, parts=8)
    plan = (topk_per_group(df, ["grp"], "score", "id", 5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "MapInPandas" in plan          # combiner stage present
    # and it sits BELOW the exchange that feeds the window sort
    assert plan.index("MapInPandas") > plan.index("Exchange")
