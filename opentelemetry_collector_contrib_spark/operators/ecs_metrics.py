"""awsecscontainermetricsreceiver re-expressed as a batch aggregation.

The reference polls the ECS task-metadata endpoint, computes an
ECSMetrics record per container and field-wise-sums them into a task
record (receiver/awsecscontainermetricsreceiver/awsecscontainermetrics/
metrics_helper.go:5-125, accumulator.go:24-60):

- memory: usage/max/limit verbatim; ``memory.utilized`` =
  (usage - stats["cache"]) / MiB with *integer* division (uint64 math).
- cpu: ``cpu.usage.vcpu`` = (total - pretotal) / (read - preread) ns
  (float64), ``cpu.utilized`` = vcpu*100, divided by the container's
  CPU reservation when one is set (accumulator.go:51-53 — note: NOT
  converted to vCPU units at container level, quirk preserved).
- network: counters summed across ALL interfaces (getNetworkStats).
- storage: last Read / last Write entry of io_service_bytes_recursive
  (assignment-in-loop semantics, metrics_helper.go:91-104).
- task rollup (accumulator.go:24-60): field-wise sum over containers;
  ``cpu.reserved`` = sum/1024 vCPU, both reservations overridable by
  task-level limits; task ``cpu.utilized`` = usage_vcpu/reserved*100.

Batch shape: one row per (task_id, container) with the raw stats JSON;
per-container metrics are a single JVM-side projection, the task rollup
is one groupBy(task_id) with map-side partial aggregation — the only
shuffle, O(tasks) output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

BYTES_IN_MIB = 1024 * 1024
CPUS_IN_VCPU = 1024

_NET = T.StructType([T.StructField(f, T.LongType()) for f in
                     ("rx_bytes", "rx_packets", "rx_errors", "rx_dropped",
                      "tx_bytes", "tx_packets", "tx_errors", "tx_dropped")])

ECS_STATS_SCHEMA = T.StructType([
    T.StructField("read", T.StringType()),
    T.StructField("preread", T.StringType()),
    T.StructField("cpu_stats", T.StructType([
        T.StructField("cpu_usage", T.StructType([
            T.StructField("total_usage", T.LongType()),
            T.StructField("usage_in_kernelmode", T.LongType()),
            T.StructField("usage_in_usermode", T.LongType()),
            T.StructField("percpu_usage", T.ArrayType(T.LongType())),
        ])),
        T.StructField("system_cpu_usage", T.LongType()),
        T.StructField("online_cpus", T.LongType()),
    ])),
    T.StructField("precpu_stats", T.StructType([
        T.StructField("cpu_usage", T.StructType([
            T.StructField("total_usage", T.LongType()),
        ])),
    ])),
    T.StructField("memory_stats", T.StructType([
        T.StructField("usage", T.LongType()),
        T.StructField("max_usage", T.LongType()),
        T.StructField("limit", T.LongType()),
        T.StructField("stats", T.MapType(T.StringType(), T.LongType())),
    ])),
    T.StructField("networks", T.MapType(T.StringType(), _NET)),
    T.StructField("network_rate_stats", T.StructType([
        T.StructField("rx_bytes_per_sec", T.DoubleType()),
        T.StructField("tx_bytes_per_sec", T.DoubleType()),
    ])),
    T.StructField("blkio_stats", T.StructType([
        T.StructField("io_service_bytes_recursive", T.ArrayType(T.StructType([
            T.StructField("op", T.StringType()),
            T.StructField("value", T.LongType()),
        ]))),
    ])),
])

_SUM_I = ("memory_usage", "memory_max_usage", "memory_limit",
          "memory_utilized", "memory_reserved", "cpu_total_usage",
          "cpu_usage_kernelmode", "cpu_usage_usermode", "num_cpu_cores",
          "cpu_online_cpus", "system_cpu_usage",
          "network_rx_bytes", "network_rx_packets", "network_rx_errors",
          "network_rx_dropped", "network_tx_bytes", "network_tx_packets",
          "network_tx_errors", "network_tx_dropped",
          "storage_read_bytes", "storage_write_bytes")
_SUM_D = ("cpu_usage_vcpu", "network_rate_rx", "network_rate_tx")

METRIC_COLS = _SUM_I + _SUM_D + ("cpu_reserved", "cpu_utilized")


def container_ecs_metrics(df: DataFrame, stats_col: str = "stats_json",
                          task_col: str = "task_id",
                          name_col: str = "container_name",
                          mem_limit_col: str = "mem_limit",
                          cpu_limit_col: str = "cpu_limit") -> DataFrame:
    """One ECSMetrics record per container (metrics_helper.go:5-77 +
    the reservation handling of accumulator.go:42-53)."""
    s = df.select(
        F.col(task_col).alias("task_id"), F.col(name_col).alias("name"),
        F.col(mem_limit_col).cast("bigint").alias("_mem_limit"),
        F.col(cpu_limit_col).cast("double").alias("_cpu_limit"),
        F.from_json(F.col(stats_col), ECS_STATS_SCHEMA).alias("j"))
    cpu = F.col("j.cpu_stats")
    mem = F.col("j.memory_stats")

    z = F.lit(0).cast("bigint")

    def zi(c):
        return F.coalesce(c.cast("bigint"), z)

    def zd(c):
        return F.coalesce(c.cast("double"), F.lit(0.0))

    # cpu.usage.vcpu (float64 delta ratio); whole-second timestamps keep
    # the ns diff exact across engines
    time_diff = ((F.unix_timestamp(F.to_timestamp(F.col("j.read")))
                  - F.unix_timestamp(F.to_timestamp(F.col("j.preread"))))
                 .cast("double") * F.lit(1e9))
    cpu_delta = (cpu["cpu_usage"]["total_usage"].cast("double")
                 - F.col("j.precpu_stats.cpu_usage.total_usage")
                 .cast("double"))
    vcpu = F.when(time_diff > 0.0, cpu_delta / time_diff).otherwise(F.lit(0.0))
    utilized = vcpu * F.lit(100.0)
    reserved = zd(F.col("_cpu_limit"))
    # container-level: divide by the raw reservation (quirk preserved)
    utilized = F.when(reserved > 0.0, utilized / reserved)\
                .otherwise(utilized)

    # network: sum over every interface (getNetworkStats)
    def net_sum(fld):
        return F.coalesce(F.aggregate(
            F.map_values(F.col("j.networks")), z,
            lambda acc, x: acc + F.coalesce(x[fld], z)), z)

    # storage: the LAST Read / Write entry wins (assignment in loop);
    # try_element_at: plain element_at(-1) THROWS on empty match arrays
    # under ANSI (payload with no Read/Write entries)
    def last_op(op):
        matches = F.filter(
            F.col("j.blkio_stats.io_service_bytes_recursive"),
            lambda e: e["op"] == op)
        return F.coalesce(F.try_element_at(matches, F.lit(-1))["value"], z)

    return s.select(
        "task_id", "name",
        zi(mem["usage"]).alias("memory_usage"),
        zi(mem["max_usage"]).alias("memory_max_usage"),
        zi(mem["limit"]).alias("memory_limit"),
        # uint64 integer division by MiB; absent "cache" counts as 0
        F.when(mem["stats"].isNotNull(),
               (zi(mem["usage"])
                - F.coalesce(F.element_at(mem["stats"], "cache"), z))
               .cast("bigint"))
        .otherwise(z).cast("bigint").alias("_mem_net"),
        zi(F.col("_mem_limit")).alias("memory_reserved"),
        zi(cpu["cpu_usage"]["total_usage"]).alias("cpu_total_usage"),
        zi(cpu["cpu_usage"]["usage_in_kernelmode"])
        .alias("cpu_usage_kernelmode"),
        zi(cpu["cpu_usage"]["usage_in_usermode"]).alias("cpu_usage_usermode"),
        F.coalesce(F.size(cpu["cpu_usage"]["percpu_usage"]), F.lit(0))
        .cast("bigint").alias("num_cpu_cores"),
        zi(cpu["online_cpus"]).alias("cpu_online_cpus"),
        zi(cpu["system_cpu_usage"]).alias("system_cpu_usage"),
        reserved.alias("cpu_reserved"),
        utilized.alias("cpu_utilized"),
        vcpu.alias("cpu_usage_vcpu"),
        zd(F.col("j.network_rate_stats.rx_bytes_per_sec"))
        .alias("network_rate_rx"),
        zd(F.col("j.network_rate_stats.tx_bytes_per_sec"))
        .alias("network_rate_tx"),
        net_sum("rx_bytes").alias("network_rx_bytes"),
        net_sum("rx_packets").alias("network_rx_packets"),
        net_sum("rx_errors").alias("network_rx_errors"),
        net_sum("rx_dropped").alias("network_rx_dropped"),
        net_sum("tx_bytes").alias("network_tx_bytes"),
        net_sum("tx_packets").alias("network_tx_packets"),
        net_sum("tx_errors").alias("network_tx_errors"),
        net_sum("tx_dropped").alias("network_tx_dropped"),
        last_op("Read").alias("storage_read_bytes"),
        last_op("Write").alias("storage_write_bytes"),
    ).withColumn("memory_utilized",
                 F.expr(f"_mem_net DIV {BYTES_IN_MIB}")).drop("_mem_net")


def ecs_task_metrics(df: DataFrame,
                     task_mem_limit_col: str = "task_mem_limit",
                     task_cpu_limit_col: str = "task_cpu_limit",
                     **kwargs) -> DataFrame:
    """Container records plus the per-task rollup (accumulator.go:24-60).

    Returns one row per container (``scope='container'``) and one per
    task (``scope='task'``, name = task_id).
    """
    con = container_ecs_metrics(df, **kwargs)
    limits = (df.groupBy(F.col(kwargs.get("task_col", "task_id"))
                         .alias("task_id"))
              .agg(F.first(F.col(task_mem_limit_col), ignorenulls=False)
                   .cast("bigint").alias("_task_mem"),
                   F.first(F.col(task_cpu_limit_col), ignorenulls=False)
                   .cast("double").alias("_task_cpu")))
    sums = (con.groupBy("task_id")
            .agg(*[F.sum(c).alias(c) for c in _SUM_I],
                 *[F.sum(c).alias(c) for c in _SUM_D],
                 F.sum("cpu_reserved").alias("_res_sum")))
    task = (sums.join(limits, "task_id")
            .withColumn("memory_reserved",
                        F.coalesce(F.col("_task_mem"),
                                   F.col("memory_reserved")))
            .withColumn("cpu_reserved",
                        F.coalesce(F.col("_task_cpu"),
                                   F.col("_res_sum")
                                   / F.lit(float(CPUS_IN_VCPU))))
            .withColumn("cpu_utilized",
                        F.when(F.col("cpu_reserved") > 0.0,
                               F.col("cpu_usage_vcpu")
                               / F.col("cpu_reserved") * F.lit(100.0))
                        .otherwise(F.lit(0.0)))
            .select("task_id", F.col("task_id").alias("name"),
                    *METRIC_COLS)
            .withColumn("scope", F.lit("task")))
    con_rows = con.withColumn("scope", F.lit("container")) \
                  .select("task_id", "name", *METRIC_COLS, "scope")
    return con_rows.unionByName(
        task.select("task_id", "name", *METRIC_COLS, "scope"))
