#!/usr/bin/env python
"""End-to-end curation-cascade bench on a synthetic web-ish corpus.

Synthesizes N documents DETERMINISTICALLY (pure column expressions,
seeded by doc id — no RNG, no Python row loop) with controlled rates
of the phenomena each cascade stage exists for:

- ~5.9% short docs (fail the Gopher n_words >= 50 rule),
- ~25% exact duplicates (doc id%4==0 repeats id-1's content key),
- ~11% near duplicates (3 extra words appended to a base doc's text),
- every doc carries the 8 canonical stopwords (header sentence), all
  alphabetic vocab with mean word length in Gopher's [3,10] band.

The corpus is materialized to parquet FIRST; the timed wall covers
only ``curation_pipeline`` (gopher gate -> exact survivors ->
MinHash-LSH + connected components -> PII scrub -> split) forced by
a single count, with the stage funnel read from the in-lineage
Observation aggregates (zero extra scans).

Besides the wall, the run is PROFILED for the two things that break a
cascade at 100 TB before the plan does — memory ceilings and shuffle
spill:

- peak JVM RSS from ``/proc/<jvm>/status`` ``VmHWM`` (the local-mode
  JVM is driver+executor in one, so this is the whole engine's
  high-water mark — no polling thread, the kernel tracks the peak);
- per-stage ``memoryBytesSpilled`` / ``diskBytesSpilled`` /
  ``shuffleBytesWritten`` from the Spark UI REST API
  (``/api/v1/applications/<id>/stages``), with the top spilling
  stages named so docs/SCALE.md can attribute them to cascade stages.

Usage: python tools/bench_curation.py [n_docs] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402

_PREFIX = ("data spark token corpus shard batch filter sample merge clean "
           "route enrich parse stream window bucket vector signal metric "
           "label").split()
_SUFFIX = ("set ing ment ware line work base flow gram node span disk "
           "lake mesh park path pool rank tide yard").split()
VOCAB = [p + s for p in _PREFIX for s in _SUFFIX]          # 400 words, 3-10ch

HEADER = ("the crawl corpus continues to rotate and refresh with care "
          "that links have shape of")                       # all 8 stopwords


def synth(spark, n: int):
    """Deterministic corpus as a DataFrame of (doc_id, text)."""
    vocab = F.array(*[F.lit(w) for w in VOCAB])             # constant-folded
    ids = spark.range(n).select(F.col("id"))
    c = F.when((F.col("id") % 4 == 0) & (F.col("id") > 0),
               F.col("id") - 1).otherwise(F.col("id"))      # exact-dup key
    df = ids.withColumn("c", c)
    ln = F.when(F.col("c") % 17 == 0, F.lit(10)) \
          .otherwise(F.lit(50) + F.pmod(F.col("c"), F.lit(100)))
    body = F.concat_ws(" ", F.transform(
        F.sequence(F.lit(1), ln),
        lambda j: F.element_at(vocab, (F.pmod(
            F.xxhash64(F.col("c"), j), F.lit(len(VOCAB))) + 1).cast("int"))))
    extra = F.when(F.col("id") % 9 == 0, F.concat_ws(
        " ", F.lit(""), *[F.element_at(vocab, (F.pmod(
            F.xxhash64(F.col("id"), F.lit(1000 + i)),
            F.lit(len(VOCAB))) + 1).cast("int")) for i in range(3)])) \
        .otherwise(F.lit(""))                               # near-dup tail
    return df.select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.concat(F.lit(HEADER), F.lit(" "), body, extra).alias("text"))


def _jvm_pid() -> int | None:
    """The gateway JVM is our direct child named ``java``."""
    me = os.getpid()
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().split()
            if parts[1] == "(java)" and int(parts[3]) == me:
                return int(p)
        except (OSError, IndexError, ValueError):
            continue
    return None


def _peak_rss_gb(pid: int | None) -> float | None:
    """Kernel-tracked peak resident set (VmHWM) of the JVM, in GiB."""
    if pid is None:
        return None
    try:
        with open(f"/proc/{pid}/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return round(int(line.split()[1]) / (1024 ** 2), 2)
    except OSError:
        pass
    return None


def _stage_profile(spark, top: int = 5) -> dict:
    """Spill + shuffle totals (and top spilling stages) from the UI API."""
    try:
        ui = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete",
                timeout=30) as r:
            stages = json.loads(r.read())
    except Exception as exc:                       # UI disabled / port taken
        return {"error": f"{type(exc).__name__}: {exc}"}
    gb = 1024 ** 3
    tot_mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    tot_disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    tot_shuf = sum(s.get("shuffleWriteBytes", 0) for s in stages)
    spillers = sorted(stages, key=lambda s: -s.get("memoryBytesSpilled", 0))
    return {
        "stages": len(stages),
        "mem_spill_gb": round(tot_mem / gb, 2),
        "disk_spill_gb": round(tot_disk / gb, 2),
        "shuffle_write_gb": round(tot_shuf / gb, 2),
        "top_spill_stages": [
            {"stage": s["stageId"],
             "name": (s.get("name") or "")[:80],
             "mem_spill_gb": round(s.get("memoryBytesSpilled", 0) / gb, 2),
             "disk_spill_gb": round(s.get("diskBytesSpilled", 0) / gb, 2)}
            for s in spillers[:top] if s.get("memoryBytesSpilled", 0) > 0],
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    # the session factory disables the UI (bench batteries run many
    # sessions); the spill profile below needs its REST API, so this
    # tool re-enables it for its own session only
    spark = get_spark(cpus=32, extra_conf={"spark.ui.enabled": "true"})
    jvm = _jvm_pid()
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        curation_pipeline)

    tmp = tempfile.mkdtemp(prefix="curation_bench_")
    try:
        corpus = os.path.join(tmp, "docs.parquet")
        synth(spark, n).repartition(32).write.parquet(corpus)
        docs = spark.read.parquet(corpus)

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from cpu_probe import effective_cores
        grant_before = effective_cores()

        t0 = time.time()
        out, obs = curation_pipeline(docs, jaccard_threshold=0.5)
        n_out = out.count()
        wall = time.time() - t0
        grant_after = effective_cores()

        funnel = {stage: int(o.get["n"]) for stage, o in obs.items()}
        print(json.dumps({
            "n_docs": n,
            "wall_sec": round(wall, 2),
            "docs_per_sec": round(n / wall),
            "n_out": n_out,
            "funnel": funnel,
            "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM", ""),
            # hypervisor grant bracketing the timed region (see
            # cpu_probe.py) — walls are only comparable at like grants
            "eff_cores_before": grant_before["eff_cores"],
            "eff_cores_after": grant_after["eff_cores"],
            "peak_jvm_rss_gb": _peak_rss_gb(jvm),
            "profile": _stage_profile(spark),
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
