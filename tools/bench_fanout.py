#!/usr/bin/env python
"""A/B bench: multi-sink fan-out strategies (persist vs staged).

Measures the end-to-end ``run_pipeline`` wall with >= 4 sinks under the
two single-pass fan-out strategies (plans/pipeline.py:_process_units):

- ``persist``: routed lineage cached MEMORY_AND_DISK (serialized),
  per-sink branches read InMemoryTableScan.  Costs ~input-sized
  executor cache; zero extra writes.
- ``staged``: routed rows written ONCE ``partitionBy(sink)`` to
  ``out_dir/fanout-staging.tmp``; branches re-read partition-pruned
  slices.  Costs one extra fan-out-sized write+read on durable
  storage; zero cache pressure.

Each (strategy, heap) cell runs in its OWN subprocess-fresh JVM (the
heap is a JVM-start option), best-of-``repeats``.  Two heap regimes:
the roomy one models a cluster where ~input-sized aggregate cache
exists; the tight one models the 100-TB regime where it does not and
persist must spill most of the frame to local disk.

Usage: python tools/bench_fanout.py [sf] [repeats]
Prints one JSON line; results recorded in BENCH/DELTAS.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

HEAPS = {"roomy": "48g", "tight": "6g"}


def run_cell(sf_dir: str, strategy: str, heap: str, cpus: int) -> dict:
    """One pipeline run in a fresh JVM; returns wall + row counts."""
    out_dir = tempfile.mkdtemp(prefix=f"fanout_{strategy}_")
    code = f"""
import json, sys, time
sys.path.insert(0, {REPO!r})
from opentelemetry_collector_contrib_spark.session import get_spark
from opentelemetry_collector_contrib_spark.plans.pipeline import (
    PipelineConfig, run_pipeline)
from opentelemetry_collector_contrib_spark.operators.routing import RoutingTable

routes = RoutingTable(
    from_attribute="source",
    table={{
        "hot-source": ["s1", "s2"],
        "app-a": ["s2", "s3"],
        "app-b": ["s3"],
        "k8s": ["s4"],
    }},
    default_sinks=["s4"],
)
spark = get_spark(app_name="bench-fanout", cpus={cpus})
cfg = PipelineConfig(
    tokens_path={sf_dir!r} + "/tokens.parquet",
    pods_path={sf_dir!r} + "/pods.parquet",
    out_dir={out_dir!r}, n_units=8, routes=routes,
    fanout_strategy={strategy!r})
t0 = time.time()
res = run_pipeline(spark, cfg)
wall = time.time() - t0
print("CELL" + json.dumps({{"wall_s": round(wall, 2),
                            "rows_in": res["rows_in"],
                            "rows_routed": res["rows_routed"]}}))
"""
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=heap)
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=3600)
        for line in out.stdout.splitlines():
            if line.startswith("CELL"):
                return json.loads(line[4:])
        return {"wall_s": None, "error": (out.stderr or "")[-500:]}
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 2.0
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8

    from opentelemetry_collector_contrib_spark import datagen
    sf_dir = datagen.ensure_sf(sf)

    # Cells are INTERLEAVED (rep-major: every strategy x regime once,
    # then again) so a drifting shared host biases all variants alike —
    # a grouped order put each variant in a different load window and
    # produced a monotone wall trend that swamped the A/B signal.
    cells: dict[str, list[float]] = {}
    meta: dict[str, dict] = {}
    for rep in range(repeats):
        for regime, heap in HEAPS.items():
            for strategy in ("persist", "staged"):
                key = f"{strategy}_{regime}"
                cell = run_cell(sf_dir, strategy, heap, cpus)
                if cell.get("wall_s") is None:
                    meta[key] = {"error": cell["error"]}
                else:
                    cells.setdefault(key, []).append(cell["wall_s"])
                    meta[key] = {"rows_in": cell["rows_in"],
                                 "rows_routed": cell["rows_routed"]}
                print(f"# rep{rep} {key} heap={heap}: "
                      f"{cell.get('wall_s') or cell.get('error', '')}",
                      file=sys.stderr)
    results = {
        key: {"heap": HEAPS[key.rsplit('_', 1)[1]],
              "walls": cells.get(key, []),
              "best_s": min(cells[key]) if cells.get(key) else None,
              **meta.get(key, {})}
        for key in meta
    }

    print(json.dumps({"metric": "fanout_ab", "sf": sf, "cpus": cpus,
                      "repeats": repeats, "results": results}))


if __name__ == "__main__":
    main()
