#!/usr/bin/env python
"""Flagship pipeline (parse -> enrich -> route -> 4-sink fan-out) at a
large scale factor, profiled the same way tools/bench_curation.py
profiles the cascade: wall, docs/s, kernel-tracked peak JVM RSS
(VmHWM), Spark-stage spill/shuffle totals, and the effective-CPU-grant
probe bracketing the timed region (tools/cpu_probe.py — this sandbox's
grant swings ~1-8 cores, which moves walls 3-8x with zero code delta).

Input comes from datagen.ensure_sf(sf) (sf8 = 48M rows / ~1.9 GB
parquet, generated chunk-streamed past the int32 list-offset ceiling).

Usage: python tools/bench_flagship_scale.py [sf] [heap] [cpus] — one
JSON line.  ``cpus`` (default 32) sets local task slots: the heap
floor scales with SLOTS (each write-task buffers an open parquet
row group), so halving slots halves the floor at a given heap.
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

from bench_curation import _jvm_pid, _peak_rss_gb, _stage_profile  # noqa: E402
from cpu_probe import effective_cores  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 8.0
    heap = sys.argv[2] if len(sys.argv) > 2 else \
        os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g")
    os.environ["SPARK_GRAFT_DRIVER_MEM"] = heap
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    block_mb = int(sys.argv[4]) if len(sys.argv) > 4 else 0  # 0 = default
    strategy = sys.argv[5] if len(sys.argv) > 5 else "persist"

    from opentelemetry_collector_contrib_spark import datagen
    from opentelemetry_collector_contrib_spark.session import get_spark
    from opentelemetry_collector_contrib_spark.plans.pipeline import (
        PipelineConfig, run_pipeline)
    from opentelemetry_collector_contrib_spark.operators.routing import (
        RoutingTable)

    sf_dir = datagen.ensure_sf(sf)
    spark = get_spark(app_name="bench-flagship-scale", cpus=cpus,
                      extra_conf={"spark.ui.enabled": "true"})
    jvm = _jvm_pid()
    routes = RoutingTable(                      # the fan-out A/B's 4-sink table
        from_attribute="source",
        table={"hot-source": ["s1", "s2"], "app-a": ["s2", "s3"],
               "app-b": ["s3"], "k8s": ["s4"]},
        default_sinks=["s4"])
    out_dir = tempfile.mkdtemp(prefix="flagship_scale_")
    try:
        cfg = PipelineConfig(
            tokens_path=os.path.join(sf_dir, "tokens.parquet"),
            pods_path=os.path.join(sf_dir, "pods.parquet"),
            out_dir=out_dir, n_units=8, routes=routes,
            fanout_strategy=strategy,
            sink_parquet_block_bytes=block_mb * 1024 * 1024 or None)
        grant_before = effective_cores()
        t0 = time.time()
        res = run_pipeline(spark, cfg)
        wall = time.time() - t0
        grant_after = effective_cores()
        print(json.dumps({
            "sf": sf,
            "rows_in": res["rows_in"],
            "rows_routed": res["rows_routed"],
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(res["rows_in"] / wall),
            "heap": heap,
            "task_slots": cpus,
            "parquet_block_mb": block_mb or 128,
            "fanout_strategy": strategy,
            "eff_cores_before": grant_before["eff_cores"],
            "eff_cores_after": grant_after["eff_cores"],
            "peak_jvm_rss_gb": _peak_rss_gb(jvm),
            "profile": _stage_profile(spark),
        }))
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
