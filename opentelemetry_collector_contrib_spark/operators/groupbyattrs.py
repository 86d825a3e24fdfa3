"""groupbyattrs — regroup records by configured attribute keys.

Reference: processor/groupbyattrsprocessor/processor.go:72-137 — for each
record, split attributes into (grouped = configured keys present on the
record, rest); move grouped keys to resource level (record value wins
over resource value on conflict, Upsert — attribute_groups.go:155-159);
coalesce records into one ResourceLogs per distinct grouping-key
combination (exact attribute-set match, attribute_groups.go:96-145).

In a flat DataFrame schema the "move to resource level" is a no-op
(columns are columns); the observable semantics are the grouping
cardinalities and per-group record counts, which is exactly
``groupBy(keys)`` — a map-side-combined hash aggregation (Spark gives
partial aggregation before the shuffle for free, which is the scale
story for 10^12 rows: the shuffle carries one row per (partition, key),
not per record).

Self-metrics (metrics.go:24-76): num_grouped_logs / num_non_grouped_logs
and the distribution of group counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_by_attrs(df: DataFrame, keys: list[str],
                   extra_aggs: dict | None = None) -> DataFrame:
    """One output row per distinct grouping-key combination, with the
    coalesced record count (processor.go:115-137).

    Records missing ALL grouping keys (NULL) form their own group, like
    the reference's non-grouped pass-through (processor.go:80-84) —
    callers can filter on the NULL group for the non-grouped count.
    """
    aggs = [F.count(F.lit(1)).alias("record_count")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*keys).agg(*aggs)


def group_by_attrs_metrics(df: DataFrame, keys: list[str]) -> DataFrame:
    """Self-observability counters (metrics.go:24-76): how many records
    carried at least one grouping key (grouped) vs none (non-grouped),
    and the number of distinct groups formed."""
    has_key = None
    for k in keys:
        cond = F.col(k).isNotNull()
        has_key = cond if has_key is None else (has_key | cond)
    grouped = F.sum(F.when(has_key, 1).otherwise(0))
    return df.agg(
        grouped.cast("long").alias("num_grouped"),
        (F.count(F.lit(1)) - grouped).cast("long").alias("num_non_grouped"),
        F.count_distinct(*[F.coalesce(F.col(k).cast("string"), F.lit("\x00"))
                           for k in keys]).alias("num_groups"),
    )


def group_by_attrs_map(df: DataFrame, map_col: str, keys: list[str],
                       extra_aggs: dict | None = None) -> DataFrame:
    """Open-map variant: group records by the VALUES of configured keys
    inside a MapType attributes column (the reference's native shape —
    attribute_groups.go:96-145 matches on exact attribute sets; with a
    fixed key list the group signature is the tuple of those values).

    Missing keys group as NULL, like the flat-column variant."""
    group_cols = [F.col(map_col).getItem(k).alias(k) for k in keys]
    aggs = [F.count(F.lit(1)).alias("record_count")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*group_cols).agg(*aggs)
