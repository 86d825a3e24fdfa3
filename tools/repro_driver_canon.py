"""Raw-value repro harness for driver-red hash rows.

The driver runs all gate queries in ONE SparkSession IT builds (not our
``session.get_spark``), then value-hashes Spark vs the DuckDB oracle.
Round 4 produced two hash-only reds (``pack_tokens``,
``pipeline_incremental_sink``) that the local gate could not reproduce —
because ``tools/check_correctness.py`` always ran under ``get_spark()``'s
confs.  This harness removes that blind spot:

- builds a DRIVER-LIKE session: bare defaults, no ``session.py`` confs
  (``--bare``, default) or our tuned session (``--tuned``) for A/B;
- runs each query TWICE in the same session and diffs RAW row values
  between the runs (in-session nondeterminism);
- diffs RAW rows against the DuckDB oracle (not hashes), printing the
  first differing rows on both sides;
- ``--battery`` runs every query in registry order first (session-state
  bleed: conf drift is logged before/after).

Usage::

    python tools/repro_driver_canon.py pack_tokens pipeline_incremental_sink
    python tools/repro_driver_canon.py --tuned --battery
"""

from __future__ import annotations

import argparse
import math
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WATCHED_CONFS = [
    "spark.sql.shuffle.partitions",
    "spark.sql.session.timeZone",
    "spark.sql.ansi.enabled",
    "spark.sql.sources.partitionOverwriteMode",
    "spark.sql.adaptive.enabled",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.autoBroadcastJoinThreshold",
]


def canon_cell(v):
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


def canon_rows(df: pd.DataFrame) -> list[str]:
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols, kind="mergesort")
    return [" | ".join(canon_cell(v) for v in rec)
            for rec in df.itertuples(index=False, name=None)]


def diff_rows(a: list[str], b: list[str], la: str, lb: str,
              limit: int = 5) -> bool:
    """Print up to ``limit`` rows unique to each side; True iff equal."""
    sa, sb = set(a), set(b)
    if a == b:
        return True
    for r in sorted(sa - sb)[:limit]:
        print(f"   {la}-only: {r[:300]}")
    for r in sorted(sb - sa)[:limit]:
        print(f"   {lb}-only: {r[:300]}")
    if sa == sb:
        print(f"   ({la} vs {lb}: same row SET, different multiplicity "
              "or order-after-sort — duplicate-row counts differ)")
    return False


def conf_snapshot(spark) -> dict:
    out = {}
    for k in WATCHED_CONFS:
        try:
            out[k] = spark.conf.get(k)
        except Exception:
            out[k] = "<unset>"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--tuned", action="store_true",
                    help="use session.get_spark() instead of bare defaults")
    ap.add_argument("--battery", action="store_true",
                    help="run ALL queries in registry order first")
    ap.add_argument("--conf", action="append", default=[],
                    metavar="K=V",
                    help="extra session conf(s), e.g. "
                         "--conf spark.sql.ansi.enabled=false — probe "
                         "conf-sensitivity beyond the bare defaults")
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)
    if args.tuned:
        from opentelemetry_collector_contrib_spark.session import get_spark
        spark = get_spark(cpus=32, extra_conf=extra)
        label = "tuned(session.get_spark)"
    else:
        from pyspark.sql import SparkSession
        # driver memory is sizing, not semantics: the stock 1g heap
        # OOMs mid-battery (ngram_dedup) and poisons the context for
        # every later query; every SQL-semantics conf stays default
        b = SparkSession.builder.master("local[32]") \
            .appName("repro-driver-canon") \
            .config("spark.driver.memory", "8g")
        for k, v in extra.items():
            b = b.config(k, v)
        spark = b.getOrCreate()
        label = "bare(local[32] defaults, 8g heap)"
    if extra:
        label += f" + {extra}"
    print(f"session: {label}")
    conf0 = conf_snapshot(spark)
    for k, v in conf0.items():
        print(f"  {k} = {v}")

    import __spark_entry__ as e
    qs, oracles = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")

    names = args.names or list(qs)
    if args.battery and not args.names:
        pass  # names already = all, in registry order
    bad = []
    for name in names:
        try:
            r1 = canon_rows(qs[name](spark, SF_DIR).toPandas())
            r2 = canon_rows(qs[name](spark, SF_DIR).toPandas())
        except Exception as ex:
            print(f"FAIL {name}: spark error: {type(ex).__name__}: "
                  f"{str(ex)[:500]}")
            bad.append(name)
            continue
        ok_rr = diff_rows(r1, r2, "run1", "run2")
        if not ok_rr:
            print(f"FAIL {name}: NONDETERMINISTIC between two in-session runs")
            bad.append(name)
        if name in oracles:
            try:
                ro = canon_rows(con.sql(oracles[name]).df())
            except Exception as ex:
                print(f"FAIL {name}: oracle error: {str(ex)[:300]}")
                bad.append(name)
                continue
            if not diff_rows(r2, ro, "spark", "oracle"):
                print(f"FAIL {name}: spark vs oracle raw-value diff "
                      f"(rows {len(r2)} vs {len(ro)})")
                bad.append(name)
            elif ok_rr:
                print(f"OK   {name}: rows={len(r2)} (run1==run2==oracle)")
        elif ok_rr:
            print(f"OK   {name}: rows={len(r2)} (no oracle; run1==run2)")

    conf1 = conf_snapshot(spark)
    drift = {k: (conf0[k], conf1[k]) for k in conf0 if conf0[k] != conf1[k]}
    if drift:
        print(f"CONF DRIFT during battery: {drift}")
    print(f"\n{len(names) - len(set(bad))}/{len(names)} clean; "
          f"failed: {sorted(set(bad))}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
