"""Filter / predicate operators.

- metadata regex key partitioning (sumologicexporter/filter.go:46-73)
  lives in sinks/writers.py (schema-level) — here is the dynamic-map
  variant for MapType attribute columns;
- k8s-style dimension filters: Equals/NotEquals label selectors applied
  server-side i.e. before broadcast (kube/client.go:331-357,
  kube/kube.go:82-100) and ignore rules (client.go:304-329);
- tail-sampling policy battery (processor/tailsamplingprocessor/
  config.go:26-41,55-80; sampling/*.go): always / numeric-range /
  string-set / rate-limit, OR-combined over trace groups
  (processor.go:138-189).  Batch re-expression: two-pass —
  per-trace policy predicate -> semi-join back to keep whole traces.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def map_metadata_filter(df: DataFrame, map_col: str, regexes: list[str],
                        filter_in: bool = True,
                        out_col: str = "metadata") -> DataFrame:
    """Dynamic-map key partitioning (filter.go:46-73): keep entries whose
    key matches any regex (filter_in) or none (filter_out)."""
    rx = "|".join(f"(?:{r})" for r in regexes) or "^\\b$"
    keep = (lambda k, v: k.rlike(rx)) if filter_in else \
           (lambda k, v: ~k.rlike(rx))
    return df.withColumn(out_col, F.map_filter(F.col(map_col), keep))


def dim_selector(df: DataFrame,
                 equals: dict[str, str] | None = None,
                 not_equals: dict[str, str] | None = None) -> DataFrame:
    """Label/field selectors, Equals/NotEquals only (kube/kube.go:82-100),
    applied to the dimension before broadcast (= scan pushdown)."""
    for k, v in (equals or {}).items():
        df = df.filter(F.col(k) == v)
    for k, v in (not_equals or {}).items():
        df = df.filter((F.col(k) != v) | F.col(k).isNull())
    return df


# -- tail sampling ----------------------------------------------------------

@dataclass
class SamplingPolicy:
    """tailsamplingprocessor/config.go:26-41 policy union."""
    name: str
    kind: str                       # always | numeric_attribute | string_attribute | rate_limiting
    attribute: str | None = None
    min_value: float | None = None  # numeric [min,max] (config.go:55-66)
    max_value: float | None = None
    values: list[str] = field(default_factory=list)  # string set (config.go:68-75)
    spans_per_second: int = 0       # rate limit (config.go:77-80)


def _policy_predicate(p: SamplingPolicy) -> Column:
    if p.kind == "always":
        return F.lit(True)
    if p.kind == "numeric_attribute":
        return F.col(p.attribute).between(p.min_value, p.max_value)
    if p.kind == "string_attribute":
        return F.col(p.attribute).isin(p.values)
    raise ValueError(f"unknown policy kind {p.kind}")


def tail_sample(df: DataFrame, policies: list[SamplingPolicy],
                trace_col: str = "trace_id",
                ts_col: str | None = None) -> DataFrame:
    """Two-pass batch tail sampling: a trace is sampled if ANY policy
    matches ANY of its spans (OR of decisions, processor.go:171-189);
    rate_limiting keeps the first spans_per_second spans per second
    (sampling/rate_limiting.go semantics) via a windowed row_number.

    Returns the sampled spans (whole traces kept together).
    """
    preds = [_policy_predicate(p) for p in policies if p.kind != "rate_limiting"]
    rate = next((p for p in policies if p.kind == "rate_limiting"), None)

    decided = None
    if preds:
        combined = preds[0]
        for p_ in preds[1:]:
            combined = combined | p_
        decided = (df.groupBy(trace_col)
                   .agg(F.max(F.when(combined, 1).otherwise(0)).alias("_keep"))
                   .filter(F.col("_keep") == 1)
                   .select(trace_col))
    out = df.join(decided, on=trace_col, how="left_semi") if decided is not None else df
    if rate is not None and ts_col is not None:
        sec = F.col(ts_col).cast("long")
        w = Window.partitionBy(sec).orderBy(trace_col)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= rate.spans_per_second)
               .drop("_rn"))
    return out


def rate_limit(df: DataFrame, rate: int, interval_ms: int,
               key_cols: list[str], time_col: str,
               tiebreak: str) -> DataFrame:
    """stanza-style rate_limit: at most ``rate`` entries per key per
    ``interval_ms`` window, earliest-first (the stanza ecosystem's
    throttling operator next to the registered trio —
    register.go:19-22; the tailsampling rate_limiting policy above is
    the trace-group variant, sampling/rate_limiting.go:33-44).

    Batch semantics are deterministic: entries rank by (time, tiebreak)
    inside each (key, interval) bucket and ranks above ``rate`` drop.
    Scale: one exchange keyed by (keys, bucket) — buckets multiply the
    key space, so hot keys spread across time and the window state is
    one counter per partition slice.

    ``time_col`` may be a timestamp (converted to epoch millis — a
    bare long cast would yield SECONDS and silently mis-size the
    bucket) or an integer millisecond column.
    """
    from pyspark.sql import types as T
    if isinstance(df.schema[time_col].dataType, T.TimestampType):
        t = F.unix_millis(F.col(time_col))
    else:
        t = F.col(time_col).cast("long")
    bucket = F.floor(t / F.lit(interval_ms))
    w = (Window.partitionBy(*key_cols, "_bucket")
         .orderBy(F.col(time_col).asc(), F.col(tiebreak).asc()))
    return (df.withColumn("_bucket", bucket)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= rate)
            .drop("_bucket", "_rn"))
