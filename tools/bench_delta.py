#!/usr/bin/env python
"""Per-query bench history: diff the driver's BENCH_r*.json files so
"which queries regressed since last round" is answerable at a glance.

Writes BENCH/DELTAS.md (a markdown per-query table, one column per
round, plus a delta column for the last two rounds) and prints it.

Caveat recorded in the table header: round 1 forced queries with
count(), which lets Catalyst prune unused projections (including
pandas UDFs) — map-only query timings in BENCH_r01.json are
under-measurements.  Round 2+ forces via the no-op sink (full plan),
so r01 -> r02 deltas on map-only queries reflect the honest force, not
a regression.

Usage: python tools/bench_delta.py
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        with open(p) as f:
            data = json.load(f)
        parsed = data.get("parsed", data)
        if isinstance(parsed, dict) and "queries" in parsed:
            rounds[int(m.group(1))] = parsed
    return rounds


def render(rounds: dict[int, dict]) -> str:
    if not rounds:
        return "# Bench deltas\n\n(no BENCH_r*.json yet)\n"
    ids = sorted(rounds)
    names: list[str] = []
    for r in ids:
        for q in rounds[r]["queries"]:
            if q not in names:
                names.append(q)
    head = "| query | " + " | ".join(f"r{r} (s)" for r in ids)
    if len(ids) >= 2:
        head += f" | r{ids[-2]}->r{ids[-1]} |"
    else:
        head += " |"
    sep = "|" + "---|" * (head.count("|") - 1)
    lines = [head, sep]
    for q in names:
        cells = []
        for r in ids:
            v = rounds[r]["queries"].get(q)
            cells.append(f"{v:.2f}" if v is not None else "—")
        row = f"| {q} | " + " | ".join(cells)
        if len(ids) >= 2:
            a = rounds[ids[-2]]["queries"].get(q)
            b = rounds[ids[-1]]["queries"].get(q)
            if a is not None and b is not None and a != 0:
                pct = (b - a) / a * 100.0
                row += f" | {pct:+.0f}% |"
            else:
                row += " | — |"
        else:
            row += " |"
        lines.append(row)
    total = "| **total** | " + " | ".join(
        f"{rounds[r]['value']:.2f}" for r in ids)
    if len(ids) >= 2:
        a, b = rounds[ids[-2]]["value"], rounds[ids[-1]]["value"]
        total += f" | {(b - a) / a * 100.0:+.0f}% |" if a else " | — |"
    else:
        total += " |"
    lines.append(total)
    meta = rounds[ids[-1]]
    return f"""# Bench deltas (per-round, per-query)

Driver-recorded wall seconds per headline query at sf0.1
({meta.get('input_rows', '?')} input rows, warm, min-of-2, best effort
on a noisy shared host).  NOTE: r01 forced with count() — Catalyst
prunes unused projections (incl. pandas UDFs) under count(), so r01
under-measures map-only queries; r02+ force the full plan through the
no-op sink.  Interpret r01->r02 increases on map-only queries as the
honest force, not a regression.

{chr(10).join(lines)}
"""


def main() -> None:
    out = render(load_rounds())
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "DELTAS.md"), "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
