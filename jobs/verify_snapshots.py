#!/usr/bin/env python
"""spark-submit/cron entry point: snapshot sweep over a pipeline's sinks.

    python jobs/verify_snapshots.py --out /path/pipeline_out [--strict]

For every sink directory under ``<out>/sinks`` (plus its quarantine
twin), runs ``sinks.maintenance.sweep_snapshots`` — `verify_snapshot`
over EVERY published version — and prints one JSON line per sink:
which historical versions are still fully pinnable (time travel works)
and which dangle (their files were rewritten by compaction / dynamic
overwrite / retention since publish).  The operator's answer to "can I
still read version N?" before anyone pays for a failed pinned read.

``--strict`` exits non-zero when the CURRENT version of any sink
dangles — that is always a bug (current must list live files); older
dangling versions are the documented parquet-stand-in behavior
(real Iceberg keeps them until expire_snapshots).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="pipeline out_dir (sinks under <out>/sinks)")
    ap.add_argument("--strict", action="store_true")
    args = ap.parse_args()

    from opentelemetry_collector_contrib_spark.sinks.maintenance import (
        current_version, sweep_snapshots)

    sink_root = os.path.join(args.out, "sinks")
    roots = []
    if os.path.isdir(sink_root):
        for name in sorted(os.listdir(sink_root)):
            p = os.path.join(sink_root, name)
            if os.path.isdir(p) and not name.startswith(("_", ".")):
                roots.append(p)
                q = p + "__quarantine"
                if os.path.isdir(q):
                    roots.append(q)
    rc = 0
    for p in roots:
        sweep = sweep_snapshots(p)
        cur = current_version(p)
        ok = sorted(v for v, miss in sweep.items() if not miss)
        bad = {v: miss[:3] for v, miss in sweep.items() if miss}
        if cur in bad:
            rc = 1
        print(json.dumps({
            "sink": p, "current_version": cur,
            "versions_pinnable": ok,
            "versions_dangling": {str(v): m for v, m in bad.items()},
            "current_ok": cur not in bad,
        }))
    return rc if args.strict else 0


if __name__ == "__main__":
    raise SystemExit(main())
