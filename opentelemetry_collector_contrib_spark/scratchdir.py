"""Per-run scratch directories for stateful gate queries.

The round-4 stateful gate queries (staged/incremental pipeline runs,
ingest dedup) used FIXED scratch paths under ``data/`` with
rmtree-then-write.  Two concurrent invocations — the driver's
correctness battery overlapping a bench run, or two local gates — race
on the same dirs: one run's rmtree deletes the other's live manifest
mid-cycle, producing exactly the hash-only red rows seen in
``CORRECTNESS_r04.json`` (reproduced live: a solo
``tools/repro_driver_canon.py`` run killed a concurrent battery's
``pipeline_incremental_sink`` with a manifest FileNotFoundError).

Fix: every run gets a ``tempfile.mkdtemp`` dir under ``data/`` and
removes it on exit.  Queries that return frames READING scratch parquet
must detach from the files before the dir is removed —
``localCheckpoint(eager=True)`` materializes the result into session
block storage, so the returned DataFrame survives the cleanup and two
concurrent runs can never see each other's state.
"""

from __future__ import annotations

import contextlib
import os
import shutil
import tempfile

def _scratch_base() -> str:
    # mirrors datagen's data-root resolution: repo checkout when the
    # package lives on disk, cwd when imported from a --py-files zip
    from .datagen import DATA_ROOT
    return DATA_ROOT


@contextlib.contextmanager
def run_scratch(tag: str):
    """Yield a unique scratch dir under ``data/``; removed on exit."""
    base = _scratch_base()
    os.makedirs(base, exist_ok=True)
    d = tempfile.mkdtemp(prefix=f"_q_{tag}_", dir=base)
    try:
        yield d
    finally:
        shutil.rmtree(d, ignore_errors=True)
