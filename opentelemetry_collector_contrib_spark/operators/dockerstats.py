"""dockerstatsreceiver re-expressed as a batch JSON translator.

The reference polls the Docker engine API per container and translates
each StatsJSON into ~40 metrics (receiver/dockerstatsreceiver/
metrics.go:45-288):

- blockio  (metrics.go:100-131): 8 stat arrays -> per-entry cumulative
  ``container.blockio.<array>.<lower(op)>`` with device_major/minor
  labels; entries with an empty Op are skipped.
- cpu      (metrics.go:133-173): 7 cumulatives plus the docker-cli
  ``cpu.percent`` gauge (metrics.go:187-204): (cpuDelta / systemDelta)
  * onlineCPUs * 100, zero unless both deltas are positive, onlineCPUs
  falling back to len(percpu_usage) when zero.
- memory   (metrics.go:206-259): usage.limit / usage.total (usage -
  stats[total_cache]) / usage.max gauges, memory.percent =
  100*(usage - stats[cache])/limit (0 when limit is 0), plus one
  metric per stats key — cumulative for the 8 page-fault counters,
  gauge (By) otherwise.
- network  (metrics.go:261-288): 8 cumulatives per interface.

Batch shape: input is a DataFrame of raw stats JSON payloads (one row
per container poll).  ``from_json`` with an explicit schema does the
decode JVM-side (no Python hop), each family is an array-of-structs
projection exploded narrowly, and map explosion handles the open-ended
``memory_stats.stats`` / ``networks`` objects — so the translation is
shuffle-free and whole-stage-codegen eligible end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

# docker engine API StatsJSON subset (field names are wire-exact)
_ENTRY = T.ArrayType(T.StructType([
    T.StructField("major", T.LongType()),
    T.StructField("minor", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("value", T.LongType()),
]))

BLKIO_ARRAYS = [
    ("io_merged_recursive", "1"),
    ("io_queued_recursive", "1"),
    ("io_service_bytes_recursive", "By"),
    ("io_service_time_recursive", "ns"),
    ("io_serviced_recursive", "1"),
    ("io_time_recursive", "ms"),
    ("io_wait_time_recursive", "1"),
    ("sectors_recursive", "1"),
]

STATS_SCHEMA = T.StructType([
    T.StructField("cpu_stats", T.StructType([
        T.StructField("cpu_usage", T.StructType([
            T.StructField("total_usage", T.LongType()),
            T.StructField("usage_in_kernelmode", T.LongType()),
            T.StructField("usage_in_usermode", T.LongType()),
            T.StructField("percpu_usage", T.ArrayType(T.LongType())),
        ])),
        T.StructField("system_cpu_usage", T.LongType()),
        T.StructField("online_cpus", T.LongType()),
        T.StructField("throttling_data", T.StructType([
            T.StructField("periods", T.LongType()),
            T.StructField("throttled_periods", T.LongType()),
            T.StructField("throttled_time", T.LongType()),
        ])),
    ])),
    T.StructField("precpu_stats", T.StructType([
        T.StructField("cpu_usage", T.StructType([
            T.StructField("total_usage", T.LongType()),
        ])),
        T.StructField("system_cpu_usage", T.LongType()),
    ])),
    T.StructField("memory_stats", T.StructType([
        T.StructField("usage", T.LongType()),
        T.StructField("max_usage", T.LongType()),
        T.StructField("limit", T.LongType()),
        T.StructField("stats", T.MapType(T.StringType(), T.LongType())),
    ])),
    T.StructField("networks", T.MapType(T.StringType(), T.StructType([
        T.StructField("rx_bytes", T.LongType()),
        T.StructField("tx_bytes", T.LongType()),
        T.StructField("rx_dropped", T.LongType()),
        T.StructField("rx_errors", T.LongType()),
        T.StructField("rx_packets", T.LongType()),
        T.StructField("tx_dropped", T.LongType()),
        T.StructField("tx_errors", T.LongType()),
        T.StructField("tx_packets", T.LongType()),
    ]))),
    T.StructField("blkio_stats", T.StructType(
        [T.StructField(n, _ENTRY) for n, _ in BLKIO_ARRAYS])),
])

MEMORY_CUMULATIVE = {  # metrics.go:206-215
    "pgfault", "pgmajfault", "pgpgin", "pgpgout",
    "total_pgfault", "total_pgmajfault", "total_pgpgin", "total_pgpgout",
}

_NETWORK_FIELDS = [  # metrics.go:270-283, all cumulative
    ("rx_bytes", "By"), ("tx_bytes", "By"),
    ("rx_dropped", "1"), ("rx_errors", "1"), ("rx_packets", "1"),
    ("tx_dropped", "1"), ("tx_errors", "1"), ("tx_packets", "1"),
]

_OUT = ("scrape_id", "metric_name", "metric_type", "units",
        "device_major", "device_minor", "interface", "value_i", "value_d")


def _null_labels():
    return [F.lit(None).cast("string").alias(c)
            for c in ("device_major", "device_minor", "interface")]


def parse_docker_stats(df: DataFrame, stats_col: str = "stats_json",
                       id_col: str = "scrape_id") -> DataFrame:
    """One stats payload per row -> the container metric battery.

    Output value columns follow the reference's int/double split:
    everything is ``value_i`` except the two computed percent gauges
    (``container.cpu.percent``, ``container.memory.percent``) which are
    ``value_d`` doubles.
    """
    s = df.select(F.col(id_col).alias("scrape_id"),
                  F.from_json(F.col(stats_col), STATS_SCHEMA).alias("j"))

    cpu = F.col("j.cpu_stats")
    pre = F.col("j.precpu_stats")
    mem = F.col("j.memory_stats")

    # absent JSON fields decode as NULL, but Go's dtypes structs are
    # value types — missing wire fields are ZERO, not nil; zero-fill so
    # e.g. a payload without throttling_data still emits 0-valued rows
    def zi(c):
        return F.coalesce(c, F.lit(0).cast("long"))

    def cum(name, val, units):
        return F.struct(
            F.lit("container." + name).alias("metric_name"),
            F.lit("cumulative").alias("metric_type"),
            F.lit(units).alias("units"),
            val.cast("bigint").alias("value_i"),
            F.lit(None).cast("double").alias("value_d"))

    def gauge(name, val, units):
        return F.struct(
            F.lit("container." + name).alias("metric_name"),
            F.lit("gauge").alias("metric_type"),
            F.lit(units).alias("units"),
            val.cast("bigint").alias("value_i"),
            F.lit(None).cast("double").alias("value_d"))

    def gauge_f(name, val, units):
        return F.struct(
            F.lit("container." + name).alias("metric_name"),
            F.lit("gauge").alias("metric_type"),
            F.lit(units).alias("units"),
            F.lit(None).cast("bigint").alias("value_i"),
            val.cast("double").alias("value_d"))

    # cpu.percent (metrics.go:187-204, docker-cli formula, float64 ops)
    cpu_delta = (zi(cpu["cpu_usage"]["total_usage"]).cast("double")
                 - zi(pre["cpu_usage"]["total_usage"]).cast("double"))
    sys_delta = (zi(cpu["system_cpu_usage"]).cast("double")
                 - zi(pre["system_cpu_usage"]).cast("double"))
    online = F.when(zi(cpu["online_cpus"]) == 0,
                    F.coalesce(F.size(cpu["cpu_usage"]["percpu_usage"]),
                               F.lit(0)).cast("double")) \
              .otherwise(cpu["online_cpus"].cast("double"))
    cpu_pct = F.when((sys_delta > 0.0) & (cpu_delta > 0.0),
                     cpu_delta / sys_delta * online * F.lit(100.0)) \
               .otherwise(F.lit(0.0))

    # memory computed gauges (metrics.go:223-243)
    total_usage = zi(mem["usage"]) - F.coalesce(
        F.element_at(mem["stats"], "total_cache"), F.lit(0))
    mem_pct = F.when(zi(mem["limit"]) == 0, F.lit(0.0)).otherwise(
        F.lit(100.0) * (zi(mem["usage"]).cast("double")
                        - F.coalesce(F.element_at(mem["stats"], "cache"),
                                     F.lit(0)).cast("double"))
        / mem["limit"].cast("double"))

    fixed = s.select("scrape_id", F.explode(F.array(
        cum("cpu.usage.system", zi(cpu["system_cpu_usage"]), "ns"),
        cum("cpu.usage.total", zi(cpu["cpu_usage"]["total_usage"]), "ns"),
        cum("cpu.usage.kernelmode",
            zi(cpu["cpu_usage"]["usage_in_kernelmode"]), "ns"),
        cum("cpu.usage.usermode",
            zi(cpu["cpu_usage"]["usage_in_usermode"]), "ns"),
        cum("cpu.throttling_data.periods",
            zi(cpu["throttling_data"]["periods"]), "1"),
        cum("cpu.throttling_data.throttled_periods",
            zi(cpu["throttling_data"]["throttled_periods"]), "1"),
        cum("cpu.throttling_data.throttled_time",
            zi(cpu["throttling_data"]["throttled_time"]), "ns"),
        gauge_f("cpu.percent", cpu_pct, "1"),
        gauge("memory.usage.limit", zi(mem["limit"]), "By"),
        gauge("memory.usage.total", total_usage, "By"),
        gauge_f("memory.percent", mem_pct, "1"),
        gauge("memory.usage.max", zi(mem["max_usage"]), "By"),
    )).alias("m")).select(
        "scrape_id", "m.metric_name", "m.metric_type", "m.units",
        *_null_labels(), "m.value_i", "m.value_d")

    # memory_stats.stats map -> one metric per key (metrics.go:245-257)
    cum_keys = sorted(MEMORY_CUMULATIVE)
    mstats = (s.select("scrape_id", F.explode(mem["stats"])
                       .alias("k", "v"))
              .select("scrape_id",
                      F.concat(F.lit("container.memory."), F.col("k"))
                      .alias("metric_name"),
                      F.when(F.col("k").isin(cum_keys), F.lit("cumulative"))
                      .otherwise(F.lit("gauge")).alias("metric_type"),
                      F.when(F.col("k").isin(cum_keys), F.lit("1"))
                      .otherwise(F.lit("By")).alias("units"),
                      *_null_labels(),
                      F.col("v").cast("bigint").alias("value_i"),
                      F.lit(None).cast("double").alias("value_d")))

    # networks map -> 8 cumulatives per interface (metrics.go:261-288)
    nets = s.select("scrape_id", F.explode(F.col("j.networks"))
                    .alias("nic", "st"))
    net_rows = nets.select("scrape_id", F.col("nic"), F.explode(F.array(*[
        F.struct(F.lit(f"container.network.io.usage.{fld}")
                 .alias("metric_name"),
                 F.lit("cumulative").alias("metric_type"),
                 F.lit(units).alias("units"),
                 F.col("st")[fld].cast("bigint").alias("value_i"),
                 F.lit(None).cast("double").alias("value_d"))
        for fld, units in _NETWORK_FIELDS])).alias("m")) \
        .select("scrape_id", "m.metric_name", "m.metric_type", "m.units",
                F.lit(None).cast("string").alias("device_major"),
                F.lit(None).cast("string").alias("device_minor"),
                F.col("nic").alias("interface"), "m.value_i", "m.value_d")

    # blkio arrays -> per-entry cumulative, empty Op skipped; all 8 stat
    # arrays tagged and concatenated in ONE branch (null arrays dropped
    # via array_compact), so the blkio family costs one pass, not eight
    def tag(arr, units):
        return F.transform(
            F.col(f"j.blkio_stats.{arr}"),
            lambda e: F.struct(
                F.concat(F.lit(f"container.blockio.{arr}."),
                         F.lower(e["op"])).alias("metric_name"),
                F.lit(units).alias("units"),
                e["major"].cast("string").alias("device_major"),
                e["minor"].cast("string").alias("device_minor"),
                e["value"].cast("bigint").alias("value_i"),
                (e["op"] == "").alias("skip")))

    blk_all = F.flatten(F.array_compact(F.array(
        *[tag(arr, units) for arr, units in BLKIO_ARRAYS])))
    blk = (s.select("scrape_id", F.explode(blk_all).alias("e"))
           .where(~F.col("e.skip"))
           .select("scrape_id", "e.metric_name",
                   F.lit("cumulative").alias("metric_type"), "e.units",
                   "e.device_major", "e.device_minor",
                   F.lit(None).cast("string").alias("interface"),
                   "e.value_i",
                   F.lit(None).cast("double").alias("value_d")))

    return (fixed.select(*_OUT)
            .unionByName(mstats.select(*_OUT))
            .unionByName(net_rows.select(*_OUT))
            .unionByName(blk.select(*_OUT)))
