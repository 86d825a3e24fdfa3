"""Z-order layout key (functions/zorder.py): interleave round-trip
against the Python inverse, pure-codegen plan, and the actual layout
property — files written in Morton order get tight min-max ranges on
BOTH dimensions (what row-group pruning needs)."""

import numpy as np
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.zorder import (
    ZBITS, deinterleave2, write_zordered, zorder2)

from conftest import rows


def test_interleave_round_trip(spark):
    rng = np.random.default_rng(3)
    pts = [(int(x), int(y)) for x, y in
           rng.integers(0, 1 << ZBITS, size=(200, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    got = rows(df.select("x", "y",
                         zorder2(F.col("x"), F.col("y")).alias("z")))
    for x, y, z in got:
        assert deinterleave2(z) == (x, y)


def test_zorder_monotone_on_each_axis():
    """Fixing one coordinate, z increases with the other (bit lanes
    are independent) — sanity for the locality argument."""
    for fixed in (0, 5, 1023):
        vals = []
        for v in range(0, 64):
            x, y = v, fixed
            z = 0
            for b in range(ZBITS):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            vals.append(z)
        assert vals == sorted(vals)


def test_key_is_pure_codegen(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    plan = (df.select(zorder2(F.col("x"), F.col("y")).alias("z"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Python" not in plan        # no Arrow/Batch eval nodes
    assert "*(1) Project" in plan      # the * marks codegen stages


def test_written_files_have_tight_ranges_on_both_dims(spark, tmp_path):
    """After write_zordered into 4 range partitions, the per-file
    span of EACH dimension should be well under the global span —
    a single-column sort cannot achieve that for both."""
    rng = np.random.default_rng(11)
    pts = [(int(x), int(y)) for x, y in
           rng.integers(0, 1 << 10, size=(4000, 2))]
    df = spark.createDataFrame(pts, "x long, y long")
    out = str(tmp_path / "z")
    write_zordered(df, out, F.col("x"), F.col("y"), bits=10,
                   partitions=4)
    back = (spark.read.parquet(out)
            .withColumn("f", F.input_file_name()))
    spans = (back.groupBy("f")
             .agg((F.max("x") - F.min("x")).alias("sx"),
                  (F.max("y") - F.min("y")).alias("sy"))
             .collect())
    assert len(spans) >= 4
    gx = 1 << 10
    # each z-range quartile confines at least one dimension to ~half
    # the domain; on average both dims must beat the global span
    assert np.mean([r.sx for r in spans]) < 0.8 * gx
    assert np.mean([r.sy for r in spans]) < 0.8 * gx
    assert min(min(r.sx, r.sy) for r in spans) <= gx / 2
