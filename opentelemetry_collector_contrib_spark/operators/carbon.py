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
    # try_* variants: ANSI mode (Spark 4 default) makes element_at/cast
    # THROW on malformed rows; parsers must flag, not crash
    named = F.try_element_at(parts, F.lit(1))
    path_parts = F.split(named, ";")
    tag_kvs = F.slice(path_parts, 2, 1_000_000)
    tags = F.map_from_entries(
        F.transform(tag_kvs, lambda kv: F.struct(
            F.split_part(kv, F.lit("="), F.lit(1)).alias("key"),
            F.split_part(kv, F.lit("="), F.lit(2)).alias("value"))))
    out = (df
           .withColumn("metric_path", F.try_element_at(path_parts, F.lit(1)))
           .withColumn("tags", tags)
           .withColumn("value", F.try_element_at(parts, F.lit(2)).try_cast("double"))
           .withColumn("ts", F.try_element_at(parts, F.lit(3)).try_cast("long")))
    # malformed lines are flagged, never dropped (the reference errors
    # per line, plaintext_parser.go:56-63; batch keeps the row for the
    # dead-letter path)
    return out.withColumn(
        "valid", F.col("value").isNotNull() & F.col("ts").isNotNull()
        & (F.col("metric_path") != ""))


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



def parse_wavefront(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Wavefront line protocol (receiver/wavefrontreceiver/
    wavefront_parser.go:61-140):

        <metricName> <metricValue> [<timestamp>] source=<src> [k=v ...]

    - value: int -> gauge_int64, else double -> gauge_double
      (wavefront_parser.go:76-86);
    - timestamp optional: the third token is a timestamp only when it
      has no '=' (wavefront_parser.go:95-106) — omitted-ts rows get a
      NULL ts here (the reference stamps wall-clock, which batch
      replays must not);
    - tags are space-separated k=v with optional double quotes;
      ``source`` is an ordinary tag (wavefront_parser.go:110-118);
      double-quote unescaping per the SDK (``\\"`` and ``\\n``).

    Output columns: metric_name, value double, is_int boolean, ts long
    (nullable), source string, tags map<string,string>.
    """
    line = F.col(line_col)
    parts = F.split(line, " ", 3)
    name = F.regexp_replace(F.try_element_at(parts, F.lit(1)), '^"|"$', "")
    value_s = F.try_element_at(parts, F.lit(2))
    rest = F.try_element_at(parts, F.lit(3))
    first = F.split_part(rest, F.lit(" "), F.lit(1))
    has_ts = first.rlike(r"^\d+$") & ~first.contains("=")
    ts = F.when(has_ts, first.try_cast("long"))
    # when a timestamp leads the rest, tags are whatever follows it
    tags_s = F.when(has_ts, F.regexp_replace(rest, r"^\d+\s*", "")) \
        .otherwise(rest)
    kvs = F.filter(F.split(F.coalesce(tags_s, F.lit("")), " "),
                   lambda t: t.contains("="))
    unesc = lambda c: F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, '^"|"$', ""), r'\\"', '"'),
        r"\\n", "\n")
    tags = F.map_from_entries(F.transform(kvs, lambda kv: F.struct(
        F.split_part(kv, F.lit("="), F.lit(1)).alias("key"),
        unesc(F.split_part(kv, F.lit("="), F.lit(2))).alias("value"))))
    return (df
            .withColumn("metric_name", name)
            .withColumn("value", value_s.try_cast("double"))
            .withColumn("is_int", value_s.rlike(r"^-?\d+$"))
            .withColumn("ts", ts)
            .withColumn("tags", tags)
            .withColumn("source", F.try_element_at(tags, F.lit("source"))))
