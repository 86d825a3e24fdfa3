"""Open attribute-map helpers — pdata AttributeMap fidelity.

The reference's records carry open ``map[string]AttributeValue``
attribute maps with three merge disciplines used across processors:

- ``Insert``  — keep the existing value on key conflict
  (k8sprocessor processor.go:137-140; resourcedetection
  internal/resourcedetection.go:176-183);
- ``Upsert``  — incoming value wins
  (groupbyattrs attribute_groups.go:155-159; resourcedetection
  resourcedetection.go:184-189);
- ``Update``  — only overwrite keys that already exist.

Our engine promotes hot keys to typed columns (SURVEY §1.4), but the
open-map form is still needed for arbitrary, schema-free keys (regex
capture groups, HEC ``fields``).  These helpers keep that path fully
JVM-side (map_* built-ins, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def attrs_from_columns(cols: list[str]) -> Column:
    """Pack columns into an attributes map (NULL values omitted, like
    pdata maps which simply lack absent keys)."""
    entries = F.array(*[
        F.struct(F.lit(c).alias("key"), F.col(c).cast("string").alias("value"))
        for c in cols])
    return F.map_from_entries(
        F.filter(entries, lambda e: e.value.isNotNull()))


def promote_keys(df: DataFrame, map_col: str, keys: list[str],
                 prefix: str = "") -> DataFrame:
    """Promote hot map keys to typed top-level columns (the inverse of
    attrs_from_columns; missing keys -> NULL)."""
    for k in keys:
        df = df.withColumn(prefix + k, F.col(map_col).getItem(k))
    return df


def merge_maps(existing: Column, incoming: Column, mode: str = "insert") -> Column:
    """Merge two attribute maps under a pdata discipline.

    insert — existing keys win (InsertString semantics);
    upsert — incoming keys win (Upsert);
    update — incoming applied ONLY to keys already present.
    """
    if mode == "insert":
        # incoming first, then existing overwrites on conflict
        return F.map_concat(
            F.map_filter(incoming, lambda k, v: ~F.map_contains_key(existing, k)),
            existing)
    if mode == "upsert":
        return F.map_concat(
            F.map_filter(existing, lambda k, v: ~F.map_contains_key(incoming, k)),
            incoming)
    if mode == "update":
        merged = F.map_zip_with(
            existing, incoming,
            lambda k, old, new: F.when(old.isNotNull(),
                                       F.coalesce(new, old)))
        # drop incoming-only keys (zip leaves them with NULL values)
        return F.map_filter(merged, lambda k, v: v.isNotNull())
    raise ValueError(f"unknown merge mode {mode!r}")
