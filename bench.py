#!/usr/bin/env python
"""Benchmark harness — the driver's per-round feedback loop.

Default mode: run the headline pipeline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``--scaling`` mode: evidence the north rule's two-cluster-size criterion
by running the SAME flagship job at two parallelism levels (N vs 4N
cores; default 2 vs 8 — the sandbox delivers ~8 real cores) in fresh
subprocesses, writing throughput at both + scaling efficiency to
BENCH/BASELINE.md.

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
            "dedup_exact", "minhash_lsh", "textstats",
            "carbon_parse", "statsd_flush", "hec_parse", "span_metrics",
            "simhash_pairs", "ann_lsh", "media_features",
            # round-2 additions: scraper parse, rules engine, nested
            # JSON translation, tokens-table packing
            "redis_info", "sfx_translation", "kubelet_stats",
            "pack_chunks",
            # late-round-2 additions: CCNet line dedup, as-of temporal
            # enrich, 60M-row token-coverage prefix scan
            "line_dedup", "asof_enrich", "token_coverage",
            # wire codec, production shape: buffered requests, ONE
            # gzip per body (sender.go:233-239) -> decode -> agg.
            # (wire_roundtrip, the per-record-frame verification
            # harness, stays gate-checked but is ~2x the bytes work.)
            "wire_batch",
            # curation batteries (fused single-hop doc filters) + DSIR
            "gopher_repetition", "c4_rules", "dsir_weights",
            # round-3 additions: IVF-PQ composite ANN (coded lists,
            # broadcast probes), LSH-blocked embedding near-dup (the
            # scale twin of the all-pairs verifier), batchpertrace
            # one-exchange window split
            "ivfpq_adc", "embed_neardup_blocked", "batch_split",
            # round-4 addition: star-edge LSH dedup (the linear-in-
            # bucket-size production path; all-pairs minhash_lsh above
            # stays as the verifier)
            "minhash_lsh_star",
            # tokens-NATIVE paths over the north-rule input (no
            # detokenize): MinHash near-dedup + quality pre-filter +
            # materialized packed training rows
            "minhash_tokens", "token_quality", "pack_tokens"]
# ann_ivf is gate-checked at sf0.01 but not a headline: its fixed
# 16-list quantizer is sized for the oracle's inlined SQL — at bench
# scale IVF needs n_lists ~ sqrt(N) (see docs/SCALE.md), and ann_lsh
# already benches the bucketed-ANN shape.

# scaling mode uses only the flagship e2e pipeline at sf2 (12M rows) —
# smaller sets measure fixed per-query overhead, not engine scaling.
# The sf dir is virtual: queries resolve their tokens/pods tables via
# datagen.tokens_dir_for(basename), so no driver tables are needed.
SCALING_QUERIES = ["pipeline_e2e"]
SCALING_SF_DIR = os.environ.get("SPARK_GRAFT_SCALE_SF_DIR", "/root/testdata/sf2")


def _force(df) -> int:
    """Run the FULL plan end-to-end via the no-op sink.  count() is NOT
    a valid force: Catalyst prunes unused deterministic projections —
    including pandas UDFs — under count(), so map-only queries would
    time little more than a parquet scan."""
    df.write.format("noop").mode("overwrite").save()
    return 0


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
    # warm pass (untimed): JVM JIT, parquet footers, and the per-core
    # Python UDF workers (pandas/numpy imports dominate the cold run) —
    # the timed pass measures engine steady-state, which is what scales
    # to a long-running cluster job
    input_rows(spark, sf_dir)
    run_queries(spark, sf_dir, names)
    # two timed passes, per-query min: the sandbox has noisy-neighbor
    # load spikes worth 2-4x on individual queries
    t1, _ = run_queries(spark, sf_dir, names)
    t2, _ = run_queries(spark, sf_dir, names)
    times = {k: min(t1[k], t2[k]) for k in t1}
    wall = round(sum(times.values()), 3)
    n_in = input_rows(spark, sf_dir)
    # the hypervisor grant on this sandbox swings ~1-8 effective cores
    # (tools/cpu_probe.py) — record it so cross-round walls can be
    # normalized for grant deltas instead of misread as code deltas
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    from cpu_probe import effective_cores
    return {
        "metric": "pipeline_wall_sec",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_dir,
        "cpus": cpus,
        "input_rows": n_in,
        "warm": True,
        "seq_per_sec": round(n_in * len([q for q in names if q in times]) / wall, 1),
        "eff_cores": effective_cores()["eff_cores"],
    }


def scaling_report(sf_dir: str) -> None:
    """Same job at N and 4N cores; efficiency = (t_N / t_4N) / 4 per the
    north rule's two-cluster-size criterion.

    N defaults to 1 (so 4N = 4): this sandbox advertises 32 CPUs but a
    process-pool probe shows only ~4 cores of RELIABLY-available
    parallel throughput (shared host; 8 concurrent procs already see
    contention), so larger spans measure host contention, not the
    engine.  Override with SPARK_GRAFT_SCALE_N.  Each level is
    best-of-3 fresh-JVM runs (the sandbox has noisy-neighbor load
    spikes).
    """
    n = int(os.environ.get("SPARK_GRAFT_SCALE_N", "1"))
    levels = (n, 4 * n)
    results = {}
    for cpus in levels:
        best = None
        for _rep in range(3):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                       SPARK_GRAFT_SF_DIR=sf_dir,
                       SPARK_GRAFT_QUERIES=",".join(SCALING_QUERIES))
            out = subprocess.run([sys.executable, __file__, "--once"],
                                 env=env, capture_output=True, text=True,
                                 cwd=REPO, timeout=3600)
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            r = json.loads(line)
            if best is None or r["value"] < best["value"]:
                best = r
        results[cpus] = best
    t_n, t_4n = results[levels[0]]["value"], results[levels[1]]["value"]
    speedup = t_n / t_4n
    eff = speedup / 4.0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # durable measurement history: every run appends here and the
    # rendered BASELINE.md re-lists all of it, so rewriting the file
    # never silently drops prior rounds' evidence
    hist_path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    with open(hist_path, "a") as hf:
        hf.write(json.dumps({
            "when": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
            "t_n": t_n, "t_4n": t_4n, "eff": round(eff, 3),
            "n": levels[0],
            "eff_cores_n": results[levels[0]].get("eff_cores"),
            "eff_cores_4n": results[levels[1]].get("eff_cores"),
        }) + "\n")
    with open(hist_path) as hf:
        hist = [json.loads(l) for l in hf if l.strip()]
    hist_rows = "\n".join(
        f"| {h['when']} | {h['t_n']:.1f} | {h['t_4n']:.1f} | "
        f"{h['eff']:.2f} | {h.get('eff_cores_n') or '—'} / "
        f"{h.get('eff_cores_4n') or '—'} |" for h in hist)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# Scaling baseline (north-rule two-cluster-size evidence)

Flagship end-to-end job (pipeline_e2e: parse -> enrich -> route ->
aggregate) on the same input ({sf_dir}), at two parallelism levels
standing in for N vs 4N executors.  Each level is best-of-3 fresh-JVM
runs (noisy shared host); warm steady-state passes are timed.  N={levels[0]} because the sandbox delivers ~8 effective cores
(a process-pool throughput probe caps there despite nproc=32), so
{levels[0]} -> {levels[1]} cores is the largest honest 4x span.

| parallelism | wall (s) | throughput (seq/s) |
|---|---|---|
| local[{levels[0]}]  (N)  | {t_n:.2f} | {results[levels[0]]['seq_per_sec']:.0f} |
| local[{levels[1]}] (4N) | {t_4n:.2f} | {results[levels[1]]['seq_per_sec']:.0f} |

- speedup {levels[0]} -> {levels[1]} cores: **{speedup:.2f}x**
- scaling efficiency (speedup / 4): **{eff:.2f}** (north rule: >= 0.8)

Measurement history (same job/input; each row best-of-3 fresh-JVM
runs; "grant" = the forked-matmul effective-core probe
tools/cpu_probe.py taken with each level's best run — a grant below
the 4N core count under-reads efficiency, one saturated by neighbors
during the N leg over-reads it; pre-probe rows show —):

| when | t_N (s) | t_4N (s) | efficiency | grant N / 4N |
|---|---|---|---|---|
{hist_rows}

Why this transfers to a real cluster: every stage is shuffle-free until
the final aggregations (scan -> Arrow parse -> broadcast join -> route
are all narrow), partitions are independent splits sized by
spark.sql.files.maxPartitionBytes, and the only wide exchanges are
map-side-combined groupBys whose shuffle volume is O(groups), not
O(rows) — none of which serialize on a coordinator.

Caveats: single-JVM local mode understates cluster scaling (shared
driver, no network shuffle); the per-query JSON is in BENCH_r*.json.
""")
    print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3),
                      "unit": "ratio", "t_n": t_n, "t_4n": t_4n, "n": levels[0],
                      "queries": {str(k): v["value"] for k, v in results.items()},
                      "sf": sf_dir}))


def main() -> None:
    if "--scaling" in sys.argv:
        from opentelemetry_collector_contrib_spark import datagen
        datagen.tokens_dir_for(SCALING_SF_DIR)   # pre-generate once
        scaling_report(SCALING_SF_DIR)
        return
    names = HEADLINE
    if os.environ.get("SPARK_GRAFT_QUERIES"):
        names = os.environ["SPARK_GRAFT_QUERIES"].split(",")
    res = bench_once(CPUS, SF_DIR, names)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
