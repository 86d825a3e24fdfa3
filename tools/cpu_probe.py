#!/usr/bin/env python
"""Effective-CPU-grant probe for this shared sandbox.

`nproc` reports 32, but the hypervisor grant observed across rounds
swings between ~1 and ~8 effective cores with neighbor load — enough
to move any wall-clock by 3-8x with zero code change.  Every recorded
bench therefore carries this probe's number from immediately before
(and after) the timed region, so cross-round comparisons can separate
code deltas from grant deltas.

Method: k forked processes each spin an 800x800 float64 matmul for
``secs``; effective cores = (sum of k-proc iteration counts) /
(single-proc count).  Pure numpy/BLAS — no Spark, no disk.

Usage: python tools/cpu_probe.py [k] — prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _spin(q, secs: float) -> None:
    a = np.random.rand(800, 800)
    t0 = time.time()
    n = 0
    while time.time() - t0 < secs:
        a @ a
        n += 1
    q.put(n)


def _run(k: int, secs: float) -> int:
    ctx = mp.get_context("fork")
    q = ctx.Queue()
    ps = [ctx.Process(target=_spin, args=(q, secs)) for _ in range(k)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total


def effective_cores(k: int = 32, secs: float = 2.0) -> dict:
    """{"one": single-proc rate, "k": k-proc total, "eff_cores": ratio}."""
    one = _run(1, secs)
    many = _run(k, secs)
    return {"one": one, "k_total": many, "k": k,
            "eff_cores": round(many / max(one, 1), 1)}


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print(json.dumps(effective_cores(k)))
