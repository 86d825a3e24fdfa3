"""Incremental corpus-dedup ingest: each ledger-committed cycle
appends ONLY sequences never seen in any previous cycle — EXACT
dedup against a 10^12-document history without ever re-scanning it.

Composes the engine's existing pieces:

- ``plans/incremental.py``'s FileLedger + deterministic cycle ids
  (the stanza file_input offsets-resume analog) discover new files
  and make a killed-and-retried cycle idempotent;
- ``datapipe/bloom.py``'s tree-OR Bloom filter is the HISTORY
  pre-filter: a Bloom MISS is a certain non-member (appended with no
  join at all), a Bloom HIT is "maybe seen" and goes to an exact
  anti-join against the digest ledger;
- the digest ledger (``digests/cycle=<id>/`` parquet of md5 array
  digests, one dir per committed cycle) is the EXACT memory — so
  correctness never depends on the Bloom filter, which only bounds
  the join's left side to |true dups| + FP_rate·|new| rows,
  independent of history size.

Crash safety (all idempotent under the deterministic cycle id):
data/digest dirs are dynamic-overwritten on retry; the bitmap update
is an OR (re-applying it is a no-op); orphan dirs of a SUPERSEDED
crashed cycle are vacuumed before processing, and the exact anti-join
reads only COMMITTED cycles' digest dirs — stale Bloom bits from a
vacuumed cycle cost a few extra join rows, never a wrong drop.

Sizing at 10^12 docs: m = -n·ln(p)/ln²2 bits (1% FP at 10^12 keys ≈
1.2 TB — shard the filter by digest prefix and probe the matching
shard, as bloom.py's docstring lays out); the digest ledger is
~48 bytes/doc of bucketed parquet, and the per-cycle anti-join
touches only the Bloom-positive slice of the increment.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.incremental import FileLedger, _cycle_id, list_input_files
from .bloom import BLOOM_K, BLOOM_M, build_bloom, might_contain
from .token_curation import tokens_digest


def _committed_digest_dirs(out_dir: str, ledger: FileLedger) -> list[str]:
    dirs = []
    for e in ledger.entries():
        p = os.path.join(out_dir, "digests", f"cycle={e['cycle_id']}")
        if os.path.isdir(p):
            dirs.append(p)
    return dirs


def _vacuum_orphans(out_dir: str, keep: set[str]) -> int:
    """Remove data/digest cycle dirs not committed and not current —
    correctness-critical for the digest side: a superseded crashed
    cycle's digests must not suppress re-ingest of docs whose data
    dir was just vacuumed."""
    removed = 0
    for sub in ("data", "digests"):
        root = os.path.join(out_dir, sub)
        if not os.path.isdir(root):
            continue
        for d in os.listdir(root):
            if d.startswith("cycle=") and d.split("=", 1)[1] not in keep:
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
                removed += 1
    return removed


def run_dedup_ingest_cycle(spark: SparkSession, input_path: str,
                           out_dir: str,
                           m: int = BLOOM_M, k: int = BLOOM_K,
                           id_col: str = "doc_id",
                           tokens_col: str = "tokens",
                           fail_before_commit: bool = False) -> dict:
    """One cycle: discover new files, drop within-cycle exact dups
    (keep-first by id), drop docs whose digest any COMMITTED cycle
    already appended (Bloom pre-filter + exact anti-join), append the
    survivors + their digests under ``cycle=<id>``, OR the survivors
    into the Bloom bitmap, commit the ledger."""
    ledger = FileLedger(os.path.join(out_dir, "_dedup_ledger"))
    all_files = list_input_files(spark, input_path)
    seen_files = ledger.processed_files()
    new = [f for f in all_files if f["path"] not in seen_files]
    if not new:
        return {"status": "no_new_data",
                "cycles": len(ledger.committed_cycles())}
    cycle = _cycle_id(new)
    _vacuum_orphans(out_dir, keep=ledger.committed_cycles() | {cycle})

    df = (spark.read.option("basePath", input_path)
          .parquet(*[f["path"] for f in new])
          .withColumn("digest", tokens_digest(tokens_col)))
    w = Window.partitionBy("digest").orderBy(F.col(id_col).asc())
    within = (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))

    bloom_path = os.path.join(out_dir, "_dedup", "bloom.bin")
    digest_dirs = _committed_digest_dirs(out_dir, ledger)
    n_in = df.count()
    if os.path.exists(bloom_path) and digest_dirs:
        with open(bloom_path, "rb") as f:
            bloom = f.read()
        tagged = might_contain(spark, within, "digest", bloom, m, k)
        # Bloom miss ⇒ certainly new; hits get the EXACT check.  The
        # anti-join's left side is only the hit slice.
        misses = tagged.filter(~F.col("hit")).drop("hit")
        hits = tagged.filter(F.col("hit")).drop("hit")
        history = spark.read.parquet(*digest_dirs).select("digest")
        survivors = misses.unionByName(
            hits.join(history, "digest", "left_anti"))
    else:
        survivors = within
    survivors = survivors.persist()

    data_dir = os.path.join(out_dir, "data", f"cycle={cycle}")
    dig_dir = os.path.join(out_dir, "digests", f"cycle={cycle}")
    survivors.drop("digest").write.mode("overwrite").parquet(data_dir)
    survivors.select("digest").write.mode("overwrite").parquet(dig_dir)
    n_app = spark.read.parquet(data_dir).count()

    # OR the cycle's digests into the bitmap — idempotent, so a retry
    # that already wrote these bits is a no-op; atomic-rename publish
    add = build_bloom(survivors.select("digest"), "digest", m, k)
    survivors.unpersist()
    if os.path.exists(bloom_path):
        with open(bloom_path, "rb") as f:
            cur = np.frombuffer(f.read(), dtype=np.uint8)
        merged = (cur | np.frombuffer(add, dtype=np.uint8)).tobytes()
    else:
        merged = add
    os.makedirs(os.path.dirname(bloom_path), exist_ok=True)
    tmp = bloom_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(merged)
    if fail_before_commit:
        os.remove(tmp)
        return {"status": "killed", "cycle_id": cycle}
    os.replace(tmp, bloom_path)
    ledger.commit_cycle(cycle, new, {
        "rows_in": n_in, "rows_appended": n_app,
        "rows_dropped": n_in - n_app})
    return {"status": "complete", "cycle_id": cycle,
            "files_processed": len(new), "rows_in": n_in,
            "rows_appended": n_app}


def read_corpus(spark: SparkSession, out_dir: str) -> DataFrame:
    """The deduped corpus: union of all committed cycles' data dirs."""
    ledger = FileLedger(os.path.join(out_dir, "_dedup_ledger"))
    dirs = [os.path.join(out_dir, "data", f"cycle={e['cycle_id']}")
            for e in ledger.entries()]
    dirs = [d for d in dirs if os.path.isdir(d)]
    if not dirs:
        raise FileNotFoundError(f"no committed cycles under {out_dir}")
    return spark.read.option("basePath", os.path.join(out_dir, "data")) \
        .parquet(*dirs)
