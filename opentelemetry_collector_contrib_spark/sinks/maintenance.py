"""Sink maintenance: small-file compaction.

The per-unit, per-sink fan-out (and the reference's 1 MiB flush sizing,
sumologicexporter/config.go:113) produces many small files over time;
training-data consumers want few large, sorted files.  ``compact``
rewrites a parquet directory to ~``target_file_bytes`` files, optionally
sorted, using a staging-dir + atomic rename so readers never observe a
half-compacted sink.

At cluster scale this is the parquet stand-in for Iceberg's
rewrite_data_files; the same call site switches to the Iceberg action
when the catalog is present.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession


def dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def compact(spark: SparkSession, path: str,
            target_file_bytes: int = 128 * 1024 * 1024,
            sort_by: list[str] | None = None) -> dict:
    """Rewrite ``path`` into ceil(bytes/target) files.  Returns
    {files_before, files_after, bytes}."""
    before = sum(len(fs) for _r, _d, fs in os.walk(path))
    size = dir_bytes(path)
    n_files = max(1, -(-size // target_file_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.coalesce(n_files)
    staging = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    df.write.mode("overwrite").parquet(staging)
    backup = f"{path.rstrip('/')}__old"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    after = sum(len(fs) for _r, _d, fs in os.walk(path))
    return {"files_before": before, "files_after": after, "bytes": size}


def publish_snapshot(path: str, run_id: str, extra: dict | None = None) -> str:
    """Atomic snapshot publish (the Iceberg-commit stand-in): write a
    `_SNAPSHOT.json` listing every data file (name, bytes) plus run
    metadata, via temp-file + rename.  Readers that pin a snapshot see
    a consistent file set even while a later run rewrites units; a
    crashed writer never leaves a half-updated snapshot.
    """
    import json
    import time

    files = []
    for root, _dirs, fs in os.walk(path):
        for f in sorted(fs):
            if f.startswith(("_", ".")):
                continue
            full = os.path.join(root, f)
            files.append({"path": os.path.relpath(full, path),
                          "bytes": os.path.getsize(full)})
    snap = {"run_id": run_id, "published_at": time.time(),
            "n_files": len(files), "total_bytes": sum(f["bytes"] for f in files),
            "files": files, **(extra or {})}
    target = os.path.join(path, "_SNAPSHOT.json")
    tmp = target + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f)
    os.replace(tmp, target)
    return target


def read_snapshot(path: str) -> dict | None:
    import json
    target = os.path.join(path, "_SNAPSHOT.json")
    if not os.path.exists(target):
        return None
    with open(target) as f:
        return json.load(f)
