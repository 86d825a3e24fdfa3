"""As-of (temporal) join: enrich facts with the newest dimension
version whose effective time <= the fact's event time.

The streaming reference keeps its k8s dimension fresh via WATCH and
resolves same-key conflicts by newest StartTime (kube/client.go:255-283
— "pick the pod with the newer StartTime for an IP"); the batch analog
over a *versioned* dimension (SCD-2 style snapshots) is exactly an
as-of join.  Spark has no built-in; the naive expression is a range
join (`f.t >= d.t` non-equi) which Catalyst executes as a per-key
cartesian — quadratic in versions and unusable at 10^12 facts.

This implements the scalable union-marker algorithm instead:

  1. union facts and dim rows on the join key, tagging each side;
  2. ONE shuffle: window partitioned by key, ordered by
     (time, is_fact) — a dim version sorts before any fact at the
     same instant, giving `>=` (inclusive) semantics;
  3. running `last(col, ignorenulls=True)` carries the newest dim
     payload forward onto every following fact row;
  4. keep fact rows only.

Cost: one hash shuffle keyed by the join key + an in-partition sort —
the same price as a plain equi-join, independent of version count.
Skew on hot keys is the usual story (AQE skew split); the window state
is O(1) per row (running last, not a buffered frame).

`tolerance_ms` mirrors pandas `merge_asof(tolerance=...)`: a match
older than the tolerance is nulled out (stale dimension guard).

Oracle twin: DuckDB's native `ASOF LEFT JOIN` (same >= semantics),
see `queries_ext.py` — every behavior here is value-hash-checked
against it, including no-match-yet NULLs and tolerance nulling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(facts: DataFrame, dim: DataFrame, on: str,
              fact_time: str, dim_time: str,
              dim_cols: list[str] | None = None,
              tolerance_ms: int | None = None) -> DataFrame:
    """Backward as-of join (newest ``dim_time`` <= ``fact_time``).

    ``facts``/``dim`` must share only the ``on`` column name; ``dim``
    must be unique per (on, dim_time) — the caller's versioned-snapshot
    contract.  Both time columns are numeric (epoch millis) so engine
    timezone handling can never skew the comparison.

    Returns every fact row plus the carried ``dim_cols`` and
    ``_asof_time`` (the matched version's time, NULL when no version
    was in effect yet or the match exceeded ``tolerance_ms``).
    """
    if dim_cols is None:
        dim_cols = [c for c in dim.columns if c not in (on, dim_time)]
    fact_payload = [c for c in facts.columns if c not in (on, fact_time)]

    f_side = facts.select(
        on, F.col(fact_time).cast("long").alias("_t"),
        F.lit(1).alias("_is_fact"),
        *[F.col(c) for c in fact_payload],
        F.lit(None).cast("long").alias("_asof_time"),
        *[F.lit(None).cast(dim.schema[c].dataType).alias(c)
          for c in dim_cols])
    d_side = dim.select(
        on, F.col(dim_time).cast("long").alias("_t"),
        F.lit(0).alias("_is_fact"),
        *[F.lit(None).cast(facts.schema[c].dataType).alias(c)
          for c in fact_payload],
        F.col(dim_time).cast("long").alias("_asof_time"),
        *[F.col(c) for c in dim_cols])

    # dim (is_fact=0) sorts before facts at the same _t -> inclusive >=
    w = (Window.partitionBy(on)
         .orderBy(F.col("_t").asc(), F.col("_is_fact").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = ["_asof_time", *dim_cols]
    out = f_side.unionByName(d_side)
    for c in carried:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.filter(F.col("_is_fact") == 1)

    if tolerance_ms is not None:
        stale = (F.col("_t") - F.col("_asof_time")) > F.lit(tolerance_ms)
        for c in dim_cols:
            out = out.withColumn(
                c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        out = out.withColumn(
            "_asof_time",
            F.when(stale, F.lit(None)).otherwise(F.col("_asof_time")))

    return out.select(on, F.col("_t").alias(fact_time), *fact_payload,
                      "_asof_time", *dim_cols)
