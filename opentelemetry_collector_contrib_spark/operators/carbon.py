"""Carbon line-protocol parsers (plaintext + regex ruleset).

Reference:
- plaintext: ``<name>[;k=v;...] <value> <ts>``, tags split on ';' then
  '=' (receiver/carbonreceiver/protocol/plaintext_parser.go:51-90).
- regex ruleset over the metric *path*: first-match-wins across rules;
  ``key_*`` captures become labels, ``name_*`` captures are joined (in
  capture order) with a separator + name_prefix to form the metric name;
  per-rule static labels and metric type gauge/cumulative; fallback to
  the plaintext name when no rule matches
  (regex_parser.go:60-96 config, 118-160 compile, 174-229 apply).
- wavefront reuses the carbon parser (wavefront_parser.go:26).

Spark-first: pure split/regexp_extract column expressions — the whole
parse stays in whole-stage codegen.  The rule cascade compiles to a
chained CASE (first-match-wins == coalesce of guarded extracts).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .regex_parser import group_number, java_pattern


def parse_plaintext(df: DataFrame, line_col: str = "line") -> DataFrame:
    """plaintext_parser.go:51-90: name[;tags] value ts -> columns.

    Output: metric_path (pre-tag name), tags map<string,string>,
    value double, ts long.
    """
    parts = F.split(F.col(line_col), " ")
    named = F.element_at(parts, 1)
    path_parts = F.split(named, ";")
    tag_kvs = F.slice(path_parts, 2, 1_000_000)
    tags = F.map_from_entries(
        F.transform(tag_kvs, lambda kv: F.struct(
            F.split_part(kv, F.lit("="), F.lit(1)).alias("key"),
            F.split_part(kv, F.lit("="), F.lit(2)).alias("value"))))
    return (df
            .withColumn("metric_path", F.element_at(path_parts, 1))
            .withColumn("tags", tags)
            .withColumn("value", F.element_at(parts, 2).cast("double"))
            .withColumn("ts", F.element_at(parts, 3).cast("long")))


@dataclass
class CarbonRegexRule:
    """regex_parser.go:60-96: one rule of the ruleset."""
    regexp: str                                   # with (?P<key_x>/(?P<name_N>) groups
    name_parts: list[str] = field(default_factory=list)   # name_* group names, order
    key_parts: list[str] = field(default_factory=list)    # key_* group names
    static_labels: dict[str, str] = field(default_factory=dict)
    metric_type: str = "gauge"                    # gauge | cumulative


def apply_regex_rules(df: DataFrame, rules: list[CarbonRegexRule],
                      name_separator: str = ".",
                      name_prefix: str = "",
                      path_col: str = "metric_path") -> DataFrame:
    """First-match-wins rule cascade (regex_parser.go:174-229).

    Adds: metric_name (rule-built or plaintext fallback), rule_labels
    map, metric_type.
    """
    path = F.col(path_col)

    name_expr: Column | None = None
    labels_expr: Column | None = None
    type_expr: Column | None = None
    for rule in rules:
        rx = java_pattern(rule.regexp)
        cond = path.rlike(rx)
        # name = prefix + name_* captures joined by separator
        name_caps = [F.regexp_extract(path, rx, group_number(rule.regexp, g))
                     for g in rule.name_parts]
        name = F.concat_ws(name_separator,
                           *([F.lit(name_prefix)] if name_prefix else []),
                           *name_caps)
        entries = [F.struct(F.lit(g).alias("key"),
                            F.regexp_extract(path, rx, group_number(rule.regexp, g))
                            .alias("value"))
                   for g in rule.key_parts]
        entries += [F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
                    for k, v in rule.static_labels.items()]
        labels = F.map_from_entries(F.array(*entries)) if entries \
            else F.from_json(F.lit("{}"), "map<string,string>")
        mtype = F.lit(rule.metric_type)
        name_expr = F.when(cond, name) if name_expr is None else name_expr.when(cond, name)
        labels_expr = F.when(cond, labels) if labels_expr is None else labels_expr.when(cond, labels)
        type_expr = F.when(cond, mtype) if type_expr is None else type_expr.when(cond, mtype)

    # fallback: plaintext name, empty labels, gauge (regex_parser.go:208-212)
    empty_map = F.from_json(F.lit("{}"), "map<string,string>")
    if name_expr is None:
        name_expr, labels_expr, type_expr = path, empty_map, F.lit("gauge")
    else:
        name_expr = name_expr.otherwise(path)
        labels_expr = labels_expr.otherwise(empty_map)
        type_expr = type_expr.otherwise(F.lit("gauge"))
    return (df.withColumn("metric_name", name_expr)
              .withColumn("rule_labels", labels_expr)
              .withColumn("metric_type", type_expr))


