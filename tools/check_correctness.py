"""Local stand-in for the driver's correctness gate.

Runs each __spark_entry__.queries() entry on Spark at sf0.01 and the
matching oracle_sql() on DuckDB (with /root/testdata/sf0.01 tables
registered as views), then compares row count, column names, and an
order-insensitive value hash.

Usage: python tools/check_correctness.py [name ...]
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_cell(v):
    """Mirror of the DRIVER's cell canon (confirmed by the round-1
    judge): floats are %.6g with NO int-collapse — an oracle float64
    column vs a Spark int64 column MUST mismatch here, because it
    mismatches there (round-1 simhash_fp)."""
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\\N"
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
        seq = v.tolist() if hasattr(v, "tolist") else v
        return "[" + ",".join(canon_cell(x) for x in seq) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return str(v)


def frame_hash(df: pd.DataFrame) -> str:
    """Mirror of the driver's _canon: sort rows via pandas sort_values
    on the RAW cells FIRST (this raises TypeError on list/array cells —
    exactly like the driver; round 1 shipped 3 red rows because the old
    local gate serialized before sorting), then serialize."""
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols, kind="mergesort")
    rows = ["\x01".join(canon_cell(v) for v in rec)
            for rec in df.itertuples(index=False, name=None)]
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode("utf-8", "surrogateescape"))
        h.update(b"\x02")
    return h.hexdigest()


def main(names: list[str]) -> int:
    import __spark_entry__ as e
    from opentelemetry_collector_contrib_spark.session import get_spark

    spark = get_spark(cpus=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    names = names or list(qs)
    failed = []
    for name in names:
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(sdf)} (no oracle)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: oracle error: {ex}")
            failed.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            try:
                if frame_hash(sdf) != frame_hash(odf):
                    problems.append("value-hash mismatch")
            except TypeError as ex:
                problems.append(f"canon TypeError (driver errs identically): {ex}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failed.append(name)
            # show a small diff sample
            cols = sorted(set(sdf.columns) & set(odf.columns))
            if cols:
                s = sdf[cols].map(canon_cell).apply("\x01".join, axis=1)
                o = odf[cols].map(canon_cell).apply("\x01".join, axis=1)
                only_s = sorted(set(s) - set(o))[:3]
                only_o = sorted(set(o) - set(s))[:3]
                for r in only_s:
                    print("   spark-only:", r.replace("\x01", " | ")[:200])
                for r in only_o:
                    print("   oracle-only:", r.replace("\x01", " | ")[:200])
        else:
            print(f"OK    {name}: rows={len(sdf)}")
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
