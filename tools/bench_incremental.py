#!/usr/bin/env python
"""Incremental-ingest scale proof: cycle cost tracks the INCREMENT,
not the table.

Builds a big initial tokens table (sf_big), ingests it as cycle 1,
appends an sf_small-sized batch of new files, ingests cycle 2, and
reports both walls plus the discovery (file-listing) time.  At 100 TB
the daily increment is orders below the table; a mode whose cycle cost
scaled with the table would be useless — this measures that it
doesn't.

Usage: python tools/bench_incremental.py [sf_big] [sf_small]
One JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cpu_probe import effective_cores  # noqa: E402


def main() -> None:
    sf_big = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    sf_small = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1

    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark import datagen
    from opentelemetry_collector_contrib_spark.session import get_spark
    from opentelemetry_collector_contrib_spark.plans.incremental import (
        list_input_files, run_pipeline_incremental)
    from opentelemetry_collector_contrib_spark.plans.pipeline import (
        PipelineConfig)

    big = datagen.ensure_sf(sf_big)
    small = datagen.ensure_sf(sf_small)
    spark = get_spark(app_name="bench-incremental")

    work = tempfile.mkdtemp(prefix="bench_inc_")
    try:
        in_dir = os.path.join(work, "tokens")
        src = os.path.join(big, "tokens.parquet")
        if os.path.isdir(src):
            shutil.copytree(src, in_dir)
        else:   # datagen writes single-file parquet at small sf
            os.makedirs(in_dir)
            shutil.copy(src, os.path.join(in_dir, "part-00000.parquet"))
        cfg = lambda: PipelineConfig(  # noqa: E731 - fresh per cycle
            tokens_path=in_dir,
            pods_path=os.path.join(big, "pods.parquet"),
            out_dir=os.path.join(work, "out"), n_units=8)

        grant0 = effective_cores()["eff_cores"]
        t0 = time.time()
        r1 = run_pipeline_incremental(spark, cfg())
        w1 = time.time() - t0

        # append an sf_small-sized batch of NEW docs (distinct ids)
        inc = (spark.read.parquet(os.path.join(small, "tokens.parquet"))
               .withColumn("doc_id", F.concat(F.lit("inc-"), F.col("doc_id"))))
        inc.write.mode("append").parquet(in_dir)
        n_inc = inc.count()

        t1 = time.time()
        files = list_input_files(spark, in_dir)
        t_list = time.time() - t1

        t2 = time.time()
        r2 = run_pipeline_incremental(spark, cfg())
        w2 = time.time() - t2
        grant1 = effective_cores()["eff_cores"]

        print(json.dumps({
            "sf_big": sf_big, "sf_small": sf_small,
            "rows_cycle1": r1["rows_in"], "rows_cycle2": r2["rows_in"],
            "wall_cycle1_s": round(w1, 1), "wall_cycle2_s": round(w2, 1),
            "cycle2_over_cycle1": round(w2 / w1, 3),
            "rows_ratio": round(n_inc / max(r1["rows_in"], 1), 3),
            "n_files": len(files), "list_files_s": round(t_list, 2),
            "eff_cores_before": grant0, "eff_cores_after": grant1,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
