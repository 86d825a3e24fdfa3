"""signalfxexporter metric-translation rules engine, batch-first.

The reference applies an ordered rule list to every datapoint batch
(exporter/signalfxexporter/translation/translator.go:27-121 actions,
:340-480 application loop, :596-666 aggregation, :712-741 split,
:743-762 convert, :764-781 copy; default rule battery in
translation/constants.go).  Datapoints are (metric, type, dimensions,
int-or-double value); rules rename/scale/convert/copy/split/aggregate/
calculate/drop them in order.

Batch shape: one DataFrame of datapoints with a ``scrape_id`` batch
column (the reference processes one export batch at a time — every
cross-datapoint action here is scoped per scrape_id the same way).
Dimensions are a ``map<string,string>`` column.  Each action compiles
to Catalyst projections/filters/unions; ``aggregate_metric`` is the
only shuffle (groupBy over O(batch) rows) and ``calculate_new_metric``
is a per-batch self-join on the dimension signature — both keyed by
(scrape_id, dims), so they scale horizontally with batches.

``delta_metric`` (translator.go:117-121; dp_to_delta state cache) is
re-expressed as an event-time lag window per (metric, dims) — batch
has the whole history, so the TTL'd prior-point cache becomes
``lag() OVER (PARTITION BY metric, dims ORDER BY ts)``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window, functions as F

DP_COLS = ("scrape_id", "metric", "metric_type", "dims", "value_i",
           "value_d", "ts")


@dataclass
class SfxRule:
    """One translation rule (translator.go:147-204 config surface)."""
    action: str
    mapping: dict | None = None
    scale_factors_int: dict | None = None
    scale_factors_float: dict | None = None
    metric_name: str = ""
    dimension_key: str = ""
    dimension_values: set | None = None
    types_mapping: dict | None = None
    aggregation_method: str = ""
    without_dimensions: list = field(default_factory=list)
    add_dimensions: dict | None = None
    copy_dimensions: dict | None = None
    metric_names: set | None = None
    operand1_metric: str = ""
    operand2_metric: str = ""
    operator: str = ""


def _lit_map(d: dict):
    items = []
    for k, v in d.items():
        items += [F.lit(str(k)), F.lit(str(v))]
    return F.create_map(*items)


def dims_signature(dims_col):
    """stringifyDimensions (translator.go:669-684): sorted ``k:v``
    parts joined with ``//`` — the deterministic dimension identity
    used for aggregation grouping, operand pairing, and output canon."""
    return F.array_join(
        F.array_sort(F.transform(
            F.map_entries(dims_col),
            lambda e: F.concat(e["key"], F.lit(":"), e["value"]))),
        "//")


def _validate(rules: list[SfxRule]) -> None:
    """validateTranslationRules (translator.go:228-321), minus the
    single-global-rename constraint that only matters for metadata."""
    for r in rules:
        a = r.action
        if a in ("rename_dimension_keys", "rename_metrics", "copy_metrics",
                 "delta_metric") and not r.mapping:
            raise ValueError(f'"mapping" is required for {a}')
        if a in ("multiply_int", "divide_int") and not r.scale_factors_int:
            raise ValueError(f'"scale_factors_int" is required for {a}')
        if a == "divide_int" and any(v == 0
                                     for v in r.scale_factors_int.values()):
            raise ValueError('"divide_int" scale factor must not be 0')
        if a == "multiply_float" and not r.scale_factors_float:
            raise ValueError(f'"scale_factors_float" is required for {a}')
        if a == "copy_metrics" and r.dimension_key and not r.dimension_values:
            raise ValueError('"dimension_values" required with '
                             '"dimension_key" for copy_metrics')
        if a == "split_metric" and not (r.metric_name and r.dimension_key
                                        and r.mapping):
            raise ValueError('split_metric needs metric_name, dimension_key,'
                             ' mapping')
        if a == "convert_values":
            if not r.types_mapping:
                raise ValueError('"types_mapping" required for convert_values')
            bad = set(r.types_mapping.values()) - {"int", "double"}
            if bad:
                raise ValueError(f"invalid value types {bad}")
        if a == "aggregate_metric":
            if not (r.metric_name and r.aggregation_method
                    and r.without_dimensions):
                raise ValueError("aggregate_metric needs metric_name,"
                                 " aggregation_method, without_dimensions")
            if r.aggregation_method not in ("count", "sum", "avg"):
                raise ValueError(
                    f'invalid aggregation_method {r.aggregation_method}')
        if a == "calculate_new_metric":
            if not (r.metric_name and r.operand1_metric and r.operand2_metric
                    and r.operator):
                raise ValueError("calculate_new_metric needs metric_name,"
                                 " operands, operator")
            if r.operator != "/":
                raise ValueError(f"invalid operator {r.operator}")
        if a == "drop_metrics" and not r.metric_names:
            raise ValueError('"metric_names" required for drop_metrics')
        if a not in _ACTIONS:
            raise ValueError(f"unknown action {a}")


# ---------------------------------------------------------------------------
# per-action transforms (each DataFrame -> DataFrame, order-preserving)
# ---------------------------------------------------------------------------

def _rename_dimension_keys(df, r):
    m = _lit_map(r.mapping)
    renamed = F.transform_keys(
        F.col("dims"), lambda k, v: F.coalesce(F.element_at(m, k), k))
    if r.metric_names:
        cond = F.col("metric").isin(sorted(r.metric_names))
        renamed = F.when(cond, renamed).otherwise(F.col("dims"))
    return df.withColumn("dims", renamed)


def _map_upsert(base, extra):
    """Merge ``extra`` into ``base`` with extra winning on key conflict
    (avoids spark.sql.mapKeyDedupPolicy=EXCEPTION on map_concat)."""
    kept = F.filter(F.map_entries(base),
                    lambda e: F.element_at(extra, e["key"]).isNull())
    return F.map_from_entries(F.concat(kept, F.map_entries(extra)))


def _rename_metrics(df, r):
    m = _lit_map(r.mapping)
    hit = F.element_at(m, F.col("metric")).isNotNull()
    dims = F.col("dims")
    if r.copy_dimensions:
        # duplicate dim values under new keys for renamed points
        cp = _lit_map(r.copy_dimensions)
        copied = F.map_from_entries(F.transform(
            F.filter(F.map_entries(dims),
                     lambda e: F.element_at(cp, e["key"]).isNotNull()),
            lambda e: F.struct(F.element_at(cp, e["key"]).alias("key"),
                               e["value"].alias("value"))))
        dims = F.when(hit, _map_upsert(dims, copied)).otherwise(dims)
    if r.add_dimensions:
        dims = F.when(hit, _map_upsert(dims, _lit_map(r.add_dimensions))) \
                .otherwise(dims)
    return (df.withColumn("dims", dims)
            .withColumn("metric", F.coalesce(F.element_at(m, F.col("metric")),
                                             F.col("metric"))))


def _scale_int(df, r, op):
    m = F.create_map(*[x for k, v in r.scale_factors_int.items()
                       for x in (F.lit(k), F.lit(int(v)))])
    f = F.element_at(m, F.col("metric"))
    if op == "mul":
        return df.withColumn(
            "value_i",
            F.when(f.isNotNull() & F.col("value_i").isNotNull(),
                   F.col("value_i") * f).otherwise(F.col("value_i")))
    # integer division truncating toward zero (Go semantics); DIV built
    # from a bound column — never string-interpolate metric names
    out = df.withColumn("_sf", f)
    newv = F.expr("CAST(value_i AS BIGINT) DIV _sf")
    return (out.withColumn(
        "value_i",
        F.when(F.col("_sf").isNotNull() & F.col("value_i").isNotNull(),
               newv).otherwise(F.col("value_i")))
        .drop("_sf"))


def _multiply_float(df, r):
    m = F.create_map(*[x for k, v in r.scale_factors_float.items()
                       for x in (F.lit(k), F.lit(float(v)))])
    f = F.element_at(m, F.col("metric"))
    return df.withColumn(
        "value_d", F.when(f.isNotNull() & F.col("value_d").isNotNull(),
                          F.col("value_d") * f).otherwise(F.col("value_d")))


def _convert_values(df, r):
    to_int = sorted(k for k, v in r.types_mapping.items() if v == "int")
    to_dbl = sorted(k for k, v in r.types_mapping.items() if v == "double")
    vi, vd = F.col("value_i"), F.col("value_d")
    # double->int truncates toward zero (Go int64(*val)); int->double exact
    new_vi = F.when(F.col("metric").isin(to_int) & vd.isNotNull(),
                    vd.cast("bigint")).otherwise(
        F.when(F.col("metric").isin(to_dbl) & vi.isNotNull(),
               F.lit(None).cast("bigint")).otherwise(vi))
    new_vd = F.when(F.col("metric").isin(to_dbl) & vi.isNotNull(),
                    vi.cast("double")).otherwise(
        F.when(F.col("metric").isin(to_int) & vd.isNotNull(),
               F.lit(None).cast("double")).otherwise(vd))
    return df.withColumns({"value_i": new_vi, "value_d": new_vd})


def _copy_metrics(df, r):
    m = _lit_map(r.mapping)
    copies = df.where(F.element_at(m, F.col("metric")).isNotNull())
    if r.dimension_key:
        copies = copies.where(
            F.element_at(F.col("dims"), F.lit(r.dimension_key))
            .isin(sorted(r.dimension_values)))
    copies = copies.withColumn(
        "metric", F.element_at(m, F.col("metric")))
    return df.unionByName(copies.select(*df.columns))


def _split_metric(df, r):
    m = _lit_map(r.mapping)
    dim_val = F.element_at(F.col("dims"), F.lit(r.dimension_key))
    new_name = F.element_at(m, dim_val)
    hit = (F.col("metric") == r.metric_name) & new_name.isNotNull()
    return df.withColumns({
        "dims": F.when(hit, F.map_filter(
            F.col("dims"), lambda k, v: k != F.lit(r.dimension_key)))
        .otherwise(F.col("dims")),
        "metric": F.when(hit, new_name).otherwise(F.col("metric")),
    })


def _aggregate_metric(df, r):
    """translator.go:596-666: group matching points by the dimension
    signature minus without_dimensions; count -> int gauge, sum keeps
    int/double split, avg -> double mean over both."""
    match = df.where(F.col("metric") == r.metric_name)
    rest = df.where(F.col("metric") != r.metric_name)
    excl = list(r.without_dimensions)
    kept = F.map_filter(F.col("dims"), lambda k, v: ~k.isin(excl))
    keyed = match.withColumn("dims", kept) \
                 .withColumn("_sig", dims_signature(F.col("dims")))
    g = keyed.groupBy("scrape_id", "metric", "_sig")
    if r.aggregation_method == "count":
        agg = g.agg(F.first("dims").alias("dims"),
                    F.min("ts").alias("ts"),
                    F.count(F.lit(1)).cast("bigint").alias("value_i")) \
               .withColumn("value_d", F.lit(None).cast("double")) \
               .withColumn("metric_type", F.lit("gauge"))
    elif r.aggregation_method == "sum":
        agg = g.agg(F.first("dims").alias("dims"),
                    F.min("ts").alias("ts"),
                    F.first("metric_type").alias("metric_type"),
                    F.sum("value_i").alias("value_i"),
                    F.sum("value_d").alias("value_d"))
    else:  # avg: mean over int+double values, double result
        agg = g.agg(F.first("dims").alias("dims"),
                    F.min("ts").alias("ts"),
                    F.first("metric_type").alias("metric_type"),
                    (F.sum(F.coalesce(F.col("value_i").cast("double"),
                                      F.lit(0.0))
                           + F.coalesce(F.col("value_d"), F.lit(0.0)))
                     / F.count(F.lit(1))).alias("value_d")) \
               .withColumn("value_i", F.lit(None).cast("bigint"))
    return rest.unionByName(agg.drop("_sig").select(*df.columns))


def _calculate_new_metric(df, r):
    """translator.go:482-573: pair operand1 x operand2 points with equal
    dimensions within the batch; emit float division, skip /0."""
    o1 = df.where(F.col("metric") == r.operand1_metric) \
           .withColumn("_sig", dims_signature(F.col("dims")))
    o2 = (df.where(F.col("metric") == r.operand2_metric)
          .withColumn("_sig", dims_signature(F.col("dims")))
          .select("scrape_id", "_sig",
                  F.coalesce(F.col("value_d"),
                             F.col("value_i").cast("double")).alias("_v2")))
    v1 = F.coalesce(F.col("value_d"), F.col("value_i").cast("double"))
    new = (o1.join(o2, ["scrape_id", "_sig"])
           .where(F.col("_v2") != 0.0)
           .select("scrape_id", F.lit(r.metric_name).alias("metric"),
                   "metric_type", "dims",
                   F.lit(None).cast("bigint").alias("value_i"),
                   (v1 / F.col("_v2")).alias("value_d"), "ts"))
    return df.unionByName(new.select(*df.columns))


def _drop_metrics(df, r):
    return df.where(~F.col("metric").isin(sorted(r.metric_names)))


def _delta_metric(df, r):
    """Batch analog of the TTL'd prior-point cache: per (metric, dims)
    ordered by ts, delta vs the previous point; first point emits
    nothing (no prior state)."""
    m = _lit_map(r.mapping)
    src = df.where(F.element_at(m, F.col("metric")).isNotNull()) \
            .withColumn("_sig", dims_signature(F.col("dims")))
    w = Window.partitionBy("metric", "_sig").orderBy("ts")
    deltas = (src
              .withColumn("_pi", F.lag("value_i").over(w))
              .withColumn("_pd", F.lag("value_d").over(w))
              .where(F.col("_pi").isNotNull() | F.col("_pd").isNotNull())
              .select("scrape_id",
                      F.element_at(m, F.col("metric")).alias("metric"),
                      F.lit("cumulative").alias("metric_type"), "dims",
                      (F.col("value_i") - F.col("_pi")).alias("value_i"),
                      (F.col("value_d") - F.col("_pd")).alias("value_d"),
                      "ts"))
    return df.unionByName(deltas.select(*df.columns))


_ACTIONS = {
    "rename_dimension_keys": _rename_dimension_keys,
    "rename_metrics": _rename_metrics,
    "multiply_int": lambda df, r: _scale_int(df, r, "mul"),
    "divide_int": lambda df, r: _scale_int(df, r, "div"),
    "multiply_float": _multiply_float,
    "convert_values": _convert_values,
    "copy_metrics": _copy_metrics,
    "split_metric": _split_metric,
    "aggregate_metric": _aggregate_metric,
    "calculate_new_metric": _calculate_new_metric,
    "drop_metrics": _drop_metrics,
    "delta_metric": _delta_metric,
}


# Rules whose output reads its input MORE THAN ONCE (union of the
# original frame with a derived branch, or a self-join): without reuse
# the whole upstream chain — scan, synth, earlier rules — is recomputed
# per branch, and chained branching rules multiply (observed: 4 full
# input scans for the default battery).  Persisting the branch input
# collapses the diamond to one computation; MEMORY_AND_DISK spills
# instead of evicting under pressure.  CacheManager keys entries by
# canonical logical plan, so re-running the same pipeline reuses the
# same cache entry rather than stacking new ones.
_BRANCHING = {"copy_metrics", "aggregate_metric", "calculate_new_metric",
              "delta_metric"}


def translate_datapoints(df: DataFrame, rules: list[SfxRule],
                         reuse: bool = True) -> DataFrame:
    """Apply the ordered rule list to a datapoint DataFrame with columns
    ``(scrape_id, metric, metric_type, dims, value_i, value_d, ts)``.

    ``reuse=False`` trades executor storage memory for recompute (the
    diamond plans come back); keep the default unless the cluster is
    storage-starved.
    """
    from pyspark import StorageLevel
    _validate(rules)
    missing = set(DP_COLS) - set(df.columns)
    if missing:
        raise ValueError(f"datapoint frame missing columns: {missing}")
    out = df
    for r in rules:
        if reuse and r.action in _BRANCHING:
            out = out.persist(StorageLevel.MEMORY_AND_DISK)
        out = _ACTIONS[r.action](out, r)
    return out
