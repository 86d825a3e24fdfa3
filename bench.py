#!/usr/bin/env python
"""Benchmark harness — the driver's per-round feedback loop.

Default mode: run the headline pipeline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode: evidence the north rule's two-cluster-size criterion
by running the SAME flagship job at two parallelism levels (local[8] vs
local[32] standing in for N vs 4N executors) in fresh subprocesses, and
writing throughput at both + scaling efficiency to BENCH/BASELINE.md.

Every query is forced end-to-end with a noop write (full computation,
no driver-side collect bottleneck).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# headline queries (a subset of __spark_entry__.queries() that spans the
# four stages: parse, enrich, route, aggregate, plus the e2e flagship)
HEADLINE = ["parse_agg", "enrich", "route_rows", "pipeline_e2e",
            "dedup_exact", "minhash_lsh", "textstats"]


def _force(df) -> int:
    """Run the full plan; cheap row count via aggregation (no collect of
    data rows — a single count row comes back)."""
    return df.count()


def run_queries(spark, sf_dir: str, names: list[str]) -> tuple[dict, int]:
    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    times: dict[str, float] = {}
    total_rows = 0
    for name in names:
        if name not in qs:
            continue
        t0 = time.time()
        total_rows += _force(qs[name](spark, sf_dir))
        times[name] = round(time.time() - t0, 3)
    return times, total_rows


def input_rows(spark, sf_dir: str) -> int:
    from opentelemetry_collector_contrib_spark import datagen
    d = datagen.tokens_dir_for(sf_dir)
    return spark.read.parquet(os.path.join(d, "tokens.parquet")).count()


def bench_once(cpus: int, sf_dir: str, names: list[str]) -> dict:
    from opentelemetry_collector_contrib_spark.session import get_spark
    spark = get_spark(app_name=f"bench-{cpus}", cpus=cpus)
    # warm the JVM + parquet footers once so timings measure the engine
    input_rows(spark, sf_dir)
    t0 = time.time()
    times, _ = run_queries(spark, sf_dir, names)
    wall = time.time() - t0
    n_in = input_rows(spark, sf_dir)
    return {
        "metric": "pipeline_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "input_rows": n_in,
        "seq_per_sec": round(n_in * len([q for q in names if q in times]) / wall, 1),
    }


def scaling_report(sf_dir: str) -> None:
    """Same job at local[8] and local[32]; efficiency = T8/(T32*4) per
    the north rule's N->4N criterion (wall-clock ratio form:
    eff = speedup/4 where speedup = t_8 / t_32)."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                   SPARK_GRAFT_SF_DIR=sf_dir)
        out = subprocess.run([sys.executable, __file__, "--once"],
                             env=env, capture_output=True, text=True,
                             cwd=REPO, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        results[cpus] = json.loads(line)
    t8, t32 = results[8]["value"], results[32]["value"]
    speedup = t8 / t32
    eff = speedup / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# Scaling baseline (north-rule two-cluster-size evidence)

Same flagship job (parse -> enrich -> route -> aggregate + dedup +
textstats headline set) on the same input ({sf_dir}), at two
parallelism levels standing in for N vs 4N executors.

| parallelism | wall (s) | throughput (seq/s) |
|---|---|---|
| local[8]  (N)  | {t8:.2f} | {results[8]['seq_per_sec']:.0f} |
| local[32] (4N) | {t32:.2f} | {results[32]['seq_per_sec']:.0f} |

- speedup 8 -> 32 cores: **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{eff:.2f}** (north rule: >= 0.8)

Caveats: single-JVM local mode understates cluster scaling (shared
driver, no network shuffle); the per-query JSON is in BENCH_r*.json.
""")
    print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3),
                      "unit": "ratio", "t8": t8, "t32": t32,
                      "queries": {str(k): v["value"] for k, v in results.items()},
                      "sf": sf_dir}))


def main() -> None:
    if "--scaling" in sys.argv:
        scaling_report(SF_DIR)
        return
    res = bench_once(CPUS, SF_DIR, HEADLINE)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
