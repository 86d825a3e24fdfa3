"""windowsperfcounters receiver re-expressed as a batch translator.

The reference scrapes Windows PDH counters and emits one DoubleGauge
metric per configured counter path, with one datapoint per counter
instance:

- config expansion: ``receiver/windowsperfcountersreceiver/
  config_windows.go:19-31`` — an empty ``instances`` list means the
  single no-instance counter ``[""]``; if ANY entry is ``"*"`` the whole
  list collapses to just the wildcard.
- path assembly: ``windowsperfcounters_scraper.go:86-92`` —
  ``\\Object(instance)\\Counter``; the parenthesised instance is omitted
  entirely when the instance is "".
- value shaping: ``internal/pdh/pdh.go:87-106``
  (``removeTotalIfMultipleValues``) — when a wildcard expansion returns
  exactly one value whose instance is ``_Total``, the instance name is
  cleared (the metric is effectively instance-less); when it returns
  more than one value, the ``_Total`` rollup row is dropped so the
  per-instance values are not double-counted.
- metric shaping: ``windowsperfcounters_scraper.go:104-150`` — the
  metric NAME is the counter path itself, the data type is DoubleGauge,
  and the ``instance`` label is set only for non-empty instance names.
- counters that fail to initialize are logged and skipped, never
  crashing the scrape (``windowsperfcounters_scraper.go:60-84``):
  batch analog = scraped rows simply absent for that path.

Batch shape: ``expand_counter_paths`` is config-plane (tiny, driver
side).  ``winperf_gauges`` is data-plane over a DataFrame of raw PDH
readings ``(scrape_id, object, instance_cfg, counter, instance_name,
value)``.  The ``_Total`` rules need a per-(scrape, path) value count —
one window over the natural partitioning key, the only exchange in the
plan; everything else is codegen'd string/CASE work, so a 100 TB scrape
archive translates with a single shuffle keyed by (scrape_id, path),
which is also the key a downstream per-counter rollup would reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOTAL_INSTANCE = "_Total"


def expand_instances(instances: list[str]) -> list[str]:
    """config_windows.go:19-31: [] -> [""]; any "*" -> ["*"]."""
    if not instances:
        return [""]
    if any(i == "*" for i in instances):
        return ["*"]
    return list(instances)


def counter_path(obj: str, instance: str, counter: str) -> str:
    """windowsperfcounters_scraper.go:86-92."""
    inst = f"({instance})" if instance != "" else ""
    return f"\\{obj}{inst}\\{counter}"


def expand_counter_paths(perfcounters: list[dict]) -> list[str]:
    """Config-plane start() expansion (scraper.go:60-76): every
    (object x expanded-instance x counter) combination becomes one
    counter path, in config order."""
    paths: list[str] = []
    for pc in perfcounters:
        for instance in expand_instances(pc.get("instances", [])):
            for counter in pc["counters"]:
                paths.append(counter_path(pc["object"], instance, counter))
    return paths


def counter_path_column(obj, instance, counter):
    """Catalyst twin of ``counter_path`` for data-plane assembly."""
    return F.concat(
        F.lit("\\"), obj,
        F.when(instance == F.lit(""), F.lit(""))
         .otherwise(F.concat(F.lit("("), instance, F.lit(")"))),
        F.lit("\\"), counter)


def winperf_gauges(scraped: DataFrame) -> DataFrame:
    """PDH readings -> DoubleGauge rows.

    Input columns: scrape_id, object, instance_cfg (the CONFIGURED
    instance, "" for instance-less counters), counter, instance_name
    (the instance PDH reported for this value — equals instance_cfg
    unless the config was the wildcard "*"), value (double).

    Output: (scrape_id, metric_name, instance, value) where
    ``metric_name`` is the counter path built from the configured
    instance and ``instance`` is null when the label is omitted.
    """
    path = counter_path_column(
        F.col("object"), F.col("instance_cfg"), F.col("counter"))
    df = scraped.withColumn("metric_name", path)
    w = Window.partitionBy("scrape_id", "metric_name")
    df = df.withColumn("n_vals", F.count(F.lit(1)).over(w))
    is_total = F.col("instance_name") == TOTAL_INSTANCE
    # pdh.go:87-106: multi-value -> drop the _Total row; single-value
    # _Total -> clear the instance name.
    df = df.filter(~(is_total & (F.col("n_vals") > 1)))
    inst = (F.when(is_total & (F.col("n_vals") == 1), F.lit(None))
            .when(F.col("instance_name") == "", F.lit(None))
            .otherwise(F.col("instance_name")))
    return df.select(
        "scrape_id", "metric_name",
        inst.cast("string").alias("instance"),
        F.col("value").cast("double").alias("value"))
