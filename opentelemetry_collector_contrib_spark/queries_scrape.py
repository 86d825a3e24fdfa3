"""Driver-contract queries for the pull-scraper receivers.

Scrape payloads (redis INFO / zookeeper mntr / nginx stub_status /
memcached stats) are synthesized deterministically from the carbon
lines table: per DISTINCT line, ``t`` = the epoch field (BIGINT) and
``vs`` = the value field (kept as its original string so double parsing
is bit-identical across engines).  The DuckDB oracles derive the
expected *parse output* from (t, vs) from first principles — they never
re-parse the payload — so every skip rule (unknown keys, empty values,
non-numeric values, keyspace contiguity) is independently checked.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.scrapers import (ReceiverTemplate, parse_memcached_stats,
                                 parse_nginx_stub_status, parse_redis_info,
                                 parse_zookeeper_mntr,
                                 receiver_creator_dispatch)

# ---------------------------------------------------------------------------
# shared base: DISTINCT carbon lines -> (scrape_id, t, vs)
# ---------------------------------------------------------------------------


def _base(spark: SparkSession, tok_dir: str) -> DataFrame:
    c = (spark.read.parquet(os.path.join(tok_dir, "carbon.parquet"))
         .select("line").distinct())
    parts = F.split(F.col("line"), " ")
    out = c.select(
        F.md5(F.col("line")).alias("scrape_id"),
        F.element_at(parts, 3).cast("bigint").alias("t"),
        F.element_at(parts, 2).alias("vs"))
    # AQE coalesces the small post-distinct shuffle to ONE partition,
    # single-threading the heavy per-scrape synth+parse downstream;
    # rebalance so the payload work parallelizes (at real scale the
    # scrape archive arrives pre-partitioned and this is a no-op shape).
    # persist: translation batteries with union/self-join branches
    # (docker_stats, ecs_task, prom_parse, ...) otherwise recompute the
    # distinct+synth chain once per branch — and CacheManager keys by
    # canonical plan, so every scrape query in the same session shares
    # this one entry instead of re-running the distinct.
    from pyspark import StorageLevel
    return (out.repartition(spark.sparkContext.defaultParallelism)
            .persist(StorageLevel.MEMORY_AND_DISK))


def _base_sql(d: str) -> str:
    return f"""base AS (
  SELECT md5(line) AS scrape_id,
         CAST(string_split(line, ' ')[3] AS BIGINT) AS t,
         string_split(line, ' ')[2] AS vs
  FROM (SELECT DISTINCT line FROM read_parquet('{d}/carbon.parquet'))
)"""


def _s(c):
    return c.cast("string")


# ---------------------------------------------------------------------------
# redis INFO
# ---------------------------------------------------------------------------

def q_redis_info(spark, sf_dir, tok_dir) -> DataFrame:
    """redis INFO parse (info.go:32-78, keyspace.go:34-63): bodies carry
    comments, an unknown key, an empty value, a conditional parse error,
    doubles from ``vs``, and a keyspace with a conditional db1 plus an
    always-beyond-the-gap db3."""
    b = _base(spark, tok_dir)
    t = F.col("t")
    body = F.concat_ws(
        "\n",
        F.lit("# Server"),
        F.lit("redis_version:6.0.9"),
        F.concat(F.lit("uptime_in_seconds:"), _s(t)),
        F.concat(F.lit("connected_clients:"), _s(t % 100)),
        F.lit("maxmemory:"),
        F.concat(F.lit("blocked_clients:"),
                 F.when(t % 7 == 0, F.lit("oops")).otherwise(_s(t % 5))),
        F.concat(F.lit("used_cpu_sys:"), F.col("vs")),
        F.concat(F.lit("used_memory:"), _s(t % 1000000)),
        F.concat(F.lit("mem_fragmentation_ratio:"), F.col("vs")),
        F.concat(F.lit("keyspace_hits:"), _s(t % 10000)),
        F.concat(F.lit("db0:keys="), _s(t % 50),
                 F.lit(",expires=2,avg_ttl="), _s(t % 1000)),
        F.when(t % 3 == 0, F.lit("db1:keys=7,expires=1"))
         .otherwise(F.lit("# no db1")),
        F.lit("db3:keys=9,expires=9,avg_ttl=9"),
    )
    return parse_redis_info(b.select("scrape_id", body.alias("body")))


def _redis_oracle(d: str) -> str:
    def fixed(name, units, mtype, vi, vd="CAST(NULL AS DOUBLE)", extra="",
              state="CAST(NULL AS VARCHAR)"):
        return f"""  SELECT scrape_id, '{name}' AS metric_name, '{units}' AS units,
         '{mtype}' AS metric_type, {state} AS state,
         CAST(NULL AS VARCHAR) AS db, {vi} AS value_i, {vd} AS value_d
  FROM base {extra}"""

    def ks(name, units, db_expr, vi, cond=""):
        return f"""  SELECT scrape_id, '{name}' AS metric_name, '{units}' AS units,
         'gauge' AS metric_type, CAST(NULL AS VARCHAR) AS state,
         {db_expr} AS db, {vi} AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base {cond}"""

    arms = [
        fixed("redis/uptime", "s", "cumulative", "t"),
        fixed("redis/clients/connected", "", "gauge", "t % 100"),
        fixed("redis/clients/blocked", "", "gauge", "t % 5",
              extra="WHERE t % 7 <> 0"),
        fixed("redis/cpu/time", "s", "cumulative", "CAST(NULL AS BIGINT)",
              "CAST(vs AS DOUBLE)", state="'sys'"),
        fixed("redis/memory/used", "By", "gauge", "t % 1000000"),
        fixed("redis/memory/fragmentation_ratio", "", "gauge",
              "CAST(NULL AS BIGINT)", "CAST(vs AS DOUBLE)"),
        fixed("redis/keyspace/hits", "", "cumulative", "t % 10000"),
        ks("redis/db/keys", "", "'0'", "t % 50"),
        ks("redis/db/expires", "", "'0'", "CAST(2 AS BIGINT)"),
        ks("redis/db/avg_ttl", "ms", "'0'", "t % 1000"),
        ks("redis/db/keys", "", "'1'", "CAST(7 AS BIGINT)",
           cond="WHERE t % 3 = 0"),
        ks("redis/db/expires", "", "'1'", "CAST(1 AS BIGINT)",
           cond="WHERE t % 3 = 0"),
        ks("redis/db/avg_ttl", "ms", "'1'", "CAST(0 AS BIGINT)",
           cond="WHERE t % 3 = 0"),
    ]
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# zookeeper mntr
# ---------------------------------------------------------------------------

def q_zk_mntr(spark, sf_dir, tok_dir) -> DataFrame:
    """zookeeper mntr parse (scraper.go:143-177): version/server_state
    become resource attributes; an unknown key, a non-integer value and
    a non-matching line are skipped."""
    b = _base(spark, tok_dir)
    t = F.col("t")
    tab = "\t"
    body = F.concat_ws(
        "\n",
        F.lit(f"zk_version{tab}3.6.2-89"),
        F.concat(F.lit(f"zk_server_state{tab}"),
                 F.when(t % 2 == 0, F.lit("leader"))
                  .otherwise(F.lit("follower"))),
        F.concat(F.lit(f"zk_avg_latency{tab}"), _s(t % 50)),
        F.concat(F.lit(f"zk_max_latency{tab}"), _s(t % 500)),
        F.concat(F.lit(f"zk_packets_received{tab}"), _s(t)),
        F.concat(F.lit(f"zk_znode_count{tab}"), _s(t % 10000)),
        F.concat(F.lit(f"zk_watch_count{tab}"), _s(t % 100)),
        F.lit(f"zk_bogus_metric{tab}5"),
        F.concat(F.lit(f"zk_followers{tab}"),
                 F.when(t % 5 == 0, F.lit("frozen")).otherwise(_s(t % 4))),
        F.lit("junk line with no zk prefix"),
    )
    return parse_zookeeper_mntr(b.select("scrape_id", body.alias("body")))


def _zk_oracle(d: str) -> str:
    def arm(name, mtype, vi, cond=""):
        return f"""  SELECT scrape_id, '{name}' AS metric_name,
         '{mtype}' AS metric_type, {vi} AS value_i,
         '3.6.2-89' AS zk_version,
         CASE WHEN t % 2 = 0 THEN 'leader' ELSE 'follower' END AS server_state
  FROM base {cond}"""
    arms = [
        arm("zookeeper.latency.avg", "gauge", "t % 50"),
        arm("zookeeper.latency.max", "gauge", "t % 500"),
        arm("zookeeper.packets.received", "sum", "t"),
        arm("zookeeper.znodes", "gauge", "t % 10000"),
        arm("zookeeper.watches", "gauge", "t % 100"),
        arm("zookeeper.followers", "gauge", "t % 4", cond="WHERE t % 5 <> 0"),
    ]
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# nginx stub_status
# ---------------------------------------------------------------------------

def _nginx_body(t):
    return F.when(t % 11 == 0, F.lit("<html>503 Service Unavailable</html>")) \
        .otherwise(F.concat_ws(
            "\n",
            F.concat(F.lit("Active connections: "), _s(t % 300)),
            F.lit("server accepts handled requests"),
            F.concat(F.lit(" "), _s(t), F.lit(" "), _s(t - t % 10),
                     F.lit(" "), _s(t % 1000000)),
            F.concat(F.lit("Reading: "), _s(t % 7),
                     F.lit(" Writing: "), _s(t % 13),
                     F.lit(" Waiting: "), _s(t % 17)),
        ))


def q_nginx_status(spark, sf_dir, tok_dir) -> DataFrame:
    """nginx stub_status parse (scraper.go:74-82); every 11th endpoint
    returns an error page and contributes no rows."""
    b = _base(spark, tok_dir)
    return parse_nginx_stub_status(
        b.select("scrape_id", _nginx_body(F.col("t")).alias("body")))


_NGINX_ARMS = [
    ("nginx.connections_active", "gauge", "t % 300"),
    ("nginx.connections_accepted", "sum", "t"),
    ("nginx.connections_handled", "sum", "t - t % 10"),
    ("nginx.requests", "sum", "t % 1000000"),
    ("nginx.connections_reading", "gauge", "t % 7"),
    ("nginx.connections_writing", "gauge", "t % 13"),
    ("nginx.connections_waiting", "gauge", "t % 17"),
]


def _nginx_oracle(d: str) -> str:
    arms = [f"""  SELECT scrape_id, '{n}' AS metric_name, '{m}' AS metric_type,
         {v} AS value_i FROM base WHERE t % 11 <> 0"""
            for n, m, v in _NGINX_ARMS]
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# memcached stats
# ---------------------------------------------------------------------------

def _mc_body(t):
    return F.concat_ws(
        "\n",
        F.lit("STAT pid 17"),
        F.concat(F.lit("STAT bytes "), _s(t % 100000)),
        F.concat(F.lit("STAT curr_connections "), _s(t % 50)),
        F.concat(F.lit("STAT total_connections "), _s(t)),
        F.concat(F.lit("STAT get_hits "), _s(t % 1000)),
        F.concat(F.lit("STAT get_misses "), _s(t % 500)),
        F.lit("STAT evictions 3"),
        F.lit("END"),
    )


def q_memcached_stats(spark, sf_dir, tok_dir) -> DataFrame:
    """memcached stats parse (scraper.go:74-90): only the 5 mapped keys
    become metrics; pid/evictions/END are ignored."""
    b = _base(spark, tok_dir)
    return parse_memcached_stats(
        b.select("scrape_id", _mc_body(F.col("t")).alias("body")))


_MC_ARMS = [
    ("memcached.bytes", "gauge", "t % 100000"),
    ("memcached.current_connections", "gauge", "t % 50"),
    ("memcached.total_connections", "sum", "t"),
    ("memcached.get_hits", "sum", "t % 1000"),
    ("memcached.get_misses", "sum", "t % 500"),
]


def _mc_oracle(d: str) -> str:
    arms = [f"""  SELECT scrape_id, '{n}' AS metric_name, '{m}' AS metric_type,
         {v} AS value_i FROM base"""
            for n, m, v in _MC_ARMS]
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# receivercreator dispatch (observer endpoints -> per-type receivers)
# ---------------------------------------------------------------------------

def q_receiver_creator(spark, sf_dir, tok_dir) -> DataFrame:
    """observer + receivercreator analog (rules.go:33-62): the endpoint
    type and port derive from t; each template's SQL rule selects its
    endpoints and instantiates the matching parser.  The memcached rows
    are left unmatched on purpose (no template) — observerhandler
    creates no receiver for them."""
    b = _base(spark, tok_dir)
    t = F.col("t")
    etype = (F.when(t % 4 == 0, F.lit("redis"))
             .when(t % 4 == 1, F.lit("zookeeper"))
             .when(t % 4 == 2, F.lit("nginx"))
             .otherwise(F.lit("memcached")))
    port = (F.when(t % 4 == 0, F.lit(6379))
            .when(t % 4 == 1, F.lit(2181))
            .when(t % 4 == 2, F.lit(80))
            .otherwise(F.lit(11211)))
    # the payload each endpoint would serve (nginx/memcached bodies reuse
    # the per-type builders; redis/zookeeper get compact single-metric
    # payloads so the dispatch oracle stays readable)
    body = (F.when(t % 4 == 0,
                   F.concat(F.lit("uptime_in_seconds:"), _s(t)))
            .when(t % 4 == 1,
                  F.concat(F.lit("zk_znode_count\t"), _s(t % 10000)))
            .when(t % 4 == 2, _nginx_body(t))
            .otherwise(_mc_body(t)))
    eps = b.select("scrape_id", etype.alias("endpoint_type"),
                   port.alias("port"), body.alias("body"))
    return receiver_creator_dispatch(eps, [
        ReceiverTemplate("redis",
                         "endpoint_type = 'redis' AND port = 6379"),
        ReceiverTemplate("zookeeper", "endpoint_type = 'zookeeper'"),
        ReceiverTemplate("nginx",
                         "endpoint_type = 'nginx' AND port = 80"),
    ])


def _rc_oracle(d: str) -> str:
    redis = """  SELECT scrape_id, 'redis' AS receiver,
         'redis/uptime' AS metric_name, 'cumulative' AS metric_type,
         t AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base WHERE t % 4 = 0"""
    zk = """  SELECT scrape_id, 'zookeeper' AS receiver,
         'zookeeper.znodes' AS metric_name, 'gauge' AS metric_type,
         t % 10000 AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base WHERE t % 4 = 1"""
    nginx = [f"""  SELECT scrape_id, 'nginx' AS receiver,
         '{n}' AS metric_name, '{m}' AS metric_type,
         {v} AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base WHERE t % 4 = 2 AND t % 11 <> 0"""
             for n, m, v in _NGINX_ARMS]
    return (f"WITH {_base_sql(d)}\n"
            + "\nUNION ALL\n".join([redis, zk] + nginx))


# ---------------------------------------------------------------------------
# dockerstats (metrics.go:45-288)
# ---------------------------------------------------------------------------

def q_docker_stats(spark, sf_dir, tok_dir) -> DataFrame:
    """dockerstats translation: a StatsJSON payload per scrape (values
    derived from t), exercising the cpu.percent docker-cli formula
    (online_cpus=0 fallback, zero-delta guard), memory.percent zero-limit
    guard, the cumulative/gauge memory-stats split, per-interface network
    counters (conditional eth1) and blkio empty-op skip."""
    from .operators.dockerstats import parse_docker_stats
    b = _base(spark, tok_dir)
    t = F.col("t")
    m = t % 1000000
    blkio_entry = lambda major, minor, op, val: F.struct(  # noqa: E731
        F.lit(major).cast("long").alias("major"),
        F.lit(minor).cast("long").alias("minor"),
        F.lit(op).alias("op"), val.cast("long").alias("value"))
    nic = lambda base: F.struct(*[  # noqa: E731
        ((base + i) % 100000).cast("long").alias(f)
        for i, f in enumerate(
            ["rx_bytes", "tx_bytes", "rx_dropped", "rx_errors",
             "rx_packets", "tx_dropped", "tx_errors", "tx_packets"])])
    stats = F.struct(
        F.struct(
            F.struct((t * 1000).alias("total_usage"),
                     (t % 5000).alias("usage_in_kernelmode"),
                     (t % 7000).alias("usage_in_usermode"),
                     F.array(F.lit(1).cast("long"), F.lit(2).cast("long"))
                     .alias("percpu_usage")).alias("cpu_usage"),
            (t * 100000).alias("system_cpu_usage"),
            (t % 4).alias("online_cpus"),
            F.struct((t % 10).alias("periods"),
                     (t % 3).alias("throttled_periods"),
                     (t % 1000).alias("throttled_time"))
            .alias("throttling_data")).alias("cpu_stats"),
        F.struct(
            F.struct((t * 1000 - (t % 1000) * 100).alias("total_usage"))
            .alias("cpu_usage"),
            (t * 100000 - 10000000).alias("system_cpu_usage"))
        .alias("precpu_stats"),
        F.struct(m.alias("usage"), (m * 2).alias("max_usage"),
                 F.when(t % 13 == 0, F.lit(0).cast("long"))
                 .otherwise(F.lit(4000000).cast("long")).alias("limit"),
                 F.create_map(
                     F.lit("cache"), t % 1000,
                     F.lit("total_cache"), t % 2000,
                     F.lit("rss"), t % 3000,
                     F.lit("pgfault"), t % 7).alias("stats"))
        .alias("memory_stats"),
        F.when(t % 5 == 0,
               F.create_map(F.lit("eth0"), nic(t), F.lit("eth1"),
                            nic(t + 50)))
        .otherwise(F.create_map(F.lit("eth0"), nic(t)))
        .alias("networks"),
        F.struct(
            F.array(blkio_entry(8, 0, "Read", t % 100),
                    blkio_entry(8, 0, "", F.lit(9)))
            .alias("io_service_bytes_recursive"),
            F.array(blkio_entry(8, 16, "Write", t % 50))
            .alias("io_serviced_recursive")).alias("blkio_stats"),
    )
    payloads = b.select("scrape_id", F.to_json(stats).alias("stats_json"))
    return parse_docker_stats(payloads)


def _docker_oracle(d: str) -> str:
    NUL_I = "CAST(NULL AS BIGINT)"
    NUL_D = "CAST(NULL AS DOUBLE)"
    NUL_S = "CAST(NULL AS VARCHAR)"

    def arm(name, mtype, units, vi=NUL_I, vd=NUL_D, dmaj=NUL_S, dmin=NUL_S,
            iface=NUL_S, cond=""):
        return f"""  SELECT scrape_id, '{name}' AS metric_name,
         '{mtype}' AS metric_type, '{units}' AS units,
         {dmaj} AS device_major, {dmin} AS device_minor,
         {iface} AS interface, {vi} AS value_i, {vd} AS value_d
  FROM base {cond}"""

    online = ("CASE WHEN t % 4 = 0 THEN CAST(2 AS DOUBLE)"
              " ELSE CAST(t % 4 AS DOUBLE) END")
    cpu_pct = (f"CASE WHEN t % 1000 = 0 THEN 0.0 ELSE"
               f" CAST((t % 1000) * 100 AS DOUBLE)"
               f" / CAST(10000000 AS DOUBLE) * {online} * 100.0 END")
    mem_pct = ("CASE WHEN t % 13 = 0 THEN 0.0 ELSE"
               " 100.0 * (CAST(t % 1000000 AS DOUBLE)"
               " - CAST(t % 1000 AS DOUBLE))"
               " / CAST(4000000 AS DOUBLE) END")
    arms = [
        arm("container.cpu.usage.system", "cumulative", "ns",
            vi="t * 100000"),
        arm("container.cpu.usage.total", "cumulative", "ns", vi="t * 1000"),
        arm("container.cpu.usage.kernelmode", "cumulative", "ns",
            vi="t % 5000"),
        arm("container.cpu.usage.usermode", "cumulative", "ns",
            vi="t % 7000"),
        arm("container.cpu.throttling_data.periods", "cumulative", "1",
            vi="t % 10"),
        arm("container.cpu.throttling_data.throttled_periods", "cumulative",
            "1", vi="t % 3"),
        arm("container.cpu.throttling_data.throttled_time", "cumulative",
            "ns", vi="t % 1000"),
        arm("container.cpu.percent", "gauge", "1", vd=cpu_pct),
        arm("container.memory.usage.limit", "gauge", "By",
            vi="CASE WHEN t % 13 = 0 THEN 0 ELSE 4000000 END"),
        arm("container.memory.usage.total", "gauge", "By",
            vi="(t % 1000000) - (t % 2000)"),
        arm("container.memory.percent", "gauge", "1", vd=mem_pct),
        arm("container.memory.usage.max", "gauge", "By",
            vi="(t % 1000000) * 2"),
        arm("container.memory.cache", "gauge", "By", vi="t % 1000"),
        arm("container.memory.total_cache", "gauge", "By", vi="t % 2000"),
        arm("container.memory.rss", "gauge", "By", vi="t % 3000"),
        arm("container.memory.pgfault", "cumulative", "1", vi="t % 7"),
        arm("container.blockio.io_service_bytes_recursive.read",
            "cumulative", "By", vi="t % 100", dmaj="'8'", dmin="'0'"),
        arm("container.blockio.io_serviced_recursive.write", "cumulative",
            "1", vi="t % 50", dmaj="'8'", dmin="'16'"),
    ]
    net_fields = [("rx_bytes", "By", 0), ("tx_bytes", "By", 1),
                  ("rx_dropped", "1", 2), ("rx_errors", "1", 3),
                  ("rx_packets", "1", 4), ("tx_dropped", "1", 5),
                  ("tx_errors", "1", 6), ("tx_packets", "1", 7)]
    for fld, units, i in net_fields:
        arms.append(arm(f"container.network.io.usage.{fld}", "cumulative",
                        units, vi=f"(t + {i}) % 100000", iface="'eth0'"))
        arms.append(arm(f"container.network.io.usage.{fld}", "cumulative",
                        units, vi=f"(t + 50 + {i}) % 100000",
                        iface="'eth1'", cond="WHERE t % 5 = 0"))
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# awsxray exporter translation (segment.go / cause.go)
# ---------------------------------------------------------------------------

_XRAY_NOW = 1598500000   # fixed "now" so trace-id age validation is stable


def q_xray_segments(spark, sf_dir, tok_dir) -> DataFrame:
    """X-Ray segment translation battery: spans varied by t exercise the
    name-precedence chain, subsegment typing, origin chain, error/fault
    split, the sanitizer, and the 28-day trace-id age gate (epoch pushed
    back 0-30 days by t%7 so the oldest rows are dropped)."""
    from .operators.xray import make_xray_segments
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    epoch = t - (t % 7) * 432000
    trace_id = F.concat(F.lower(F.hex(epoch)), F.substring(h, 1, 24))
    kind = (F.when(t % 3 == 0, F.lit("SERVER"))
            .when(t % 3 == 1, F.lit("CLIENT"))
            .otherwise(F.lit("INTERNAL")))
    NS = F.lit(None).cast("string")
    spans = b.select(
        trace_id.alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.when(t % 2 == 0, F.substring(h, 17, 16)).alias("parent_span_id"),
        kind.alias("kind"),
        F.concat(F.lit("op$"), _s(t % 10)).alias("span_name"),
        (t * 1000000000).alias("start_ns"),
        (t * 1000000000 + 1500000000).alias("end_ns"),
        F.when(t % 4 == 1, F.lit("ERROR")).otherwise(F.lit("OK"))
        .alias("status_code"),
        F.when(t % 2 == 0, 400 + t % 200).cast("long").alias("http_status"),
        F.when(t % 5 == 0, F.lit("psvc")).alias("peer_service"),
        F.when(t % 5 == 1, F.lit("DynamoDB")).alias("aws_service"),
        F.when(t % 5 == 2, F.lit("db1")).alias("db_name"),
        NS.alias("rpc_service"),
        F.when(t % 5 == 3, F.lit("h.example.com")).alias("http_host"),
        NS.alias("net_peer_name"),
        F.when(t % 9 == 0, F.concat(F.lit("u"), _s(t % 4)))
        .alias("enduser_id"),
        F.lit("svc").alias("service_name"),
        F.when(t % 4 == 3, F.lit("gcp")).otherwise(F.lit("aws"))
        .alias("cloud_provider"),
        NS.alias("infra_service"), NS.alias("ecs_launchtype"),
        F.when(t % 6 == 0, F.lit("k")).alias("k8s_cluster"),
        NS.alias("service_instance"),
        F.when(t % 6 == 1, F.lit("c")).alias("container_name"),
        F.when((t % 6 == 2) | (t % 6 == 3), F.lit("i-1")).alias("host_id"),
    )
    return make_xray_segments(spans, now_epoch=_XRAY_NOW)


def _xray_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)},
spans AS (
  SELECT scrape_id, t, md5(scrape_id) AS h,
         t - (t % 7) * 432000 AS epoch,
         CASE WHEN t % 3 = 0 THEN 'SERVER'
              WHEN t % 3 = 1 THEN 'CLIENT' ELSE 'INTERNAL' END AS kind
  FROM base
)
SELECT substr(h, 1, 16) AS id,
       '1-' || printf('%08x', epoch) || '-' || substr(h, 1, 24)
           AS trace_id_xray,
       CASE WHEN t % 5 = 0 THEN 'psvc'
            WHEN t % 5 = 1 THEN 'DynamoDB'
            WHEN t % 5 = 2 THEN 'db1'
            WHEN kind = 'SERVER' THEN 'svc'
            WHEN t % 5 = 3 THEN 'h.example.com'
            ELSE 'op' || CAST(t % 10 AS VARCHAR) END AS name,
       CASE WHEN kind <> 'SERVER' AND t % 2 = 0 THEN 'subsegment'
            ELSE '' END AS segment_type,
       CASE WHEN t % 5 = 1 THEN 'aws'
            WHEN kind = 'CLIENT' THEN 'remote' ELSE '' END AS namespace,
       CASE WHEN t % 4 = 3 THEN ''
            WHEN t % 6 = 0 THEN 'AWS::EKS::Container'
            WHEN t % 6 = 1 THEN 'AWS::ECS::Container'
            WHEN t % 6 IN (2, 3) THEN 'AWS::EC2::Instance'
            ELSE '' END AS origin,
       CAST(t * 1000000000 AS DOUBLE) / 1e9 AS start_time,
       CAST(t * 1000000000 + 1500000000 AS DOUBLE) / 1e9 AS end_time,
       CASE WHEN t % 2 = 0 THEN substr(h, 17, 16) ELSE '' END AS parent_id,
       (t % 4 = 1 AND t % 2 = 0 AND t % 200 <= 99) AS error,
       (t % 4 = 1 AND NOT (t % 2 = 0 AND t % 200 <= 99)) AS fault,
       CASE WHEN t % 9 = 0 THEN 'u' || CAST(t % 4 AS VARCHAR)
            ELSE '' END AS "user"
FROM spans
WHERE ({_XRAY_NOW} - epoch) <= {60 * 60 * 24 * 28}
  AND ({_XRAY_NOW} - epoch) >= -{60 * 5}"""


# ---------------------------------------------------------------------------
# awsecscontainermetrics (metrics_helper.go + accumulator.go)
# ---------------------------------------------------------------------------

def q_ecs_task(spark, sf_dir, tok_dir) -> DataFrame:
    """ECS task-metadata translation: two containers per task with a
    2-second stats window; c0 carries a CPU reservation (container
    cpu.utilized divided by it), c1 none; task limits override the
    summed reservations conditionally (t%2 / t%3)."""
    from .operators.ecs_metrics import ecs_task_metrics, METRIC_COLS
    b = _base(spark, tok_dir)
    t = F.col("t")

    def stats(e):
        pre = t % 50000
        total = pre + t % 300000 + 1000 * e
        mib = 1048576
        nic = F.create_map(F.lit("eth0"), F.struct(
            (t % 10 + e).cast("long").alias("rx_bytes"),
            (t % 11 + e).cast("long").alias("rx_packets"),
            (t % 3 + e).cast("long").alias("rx_errors"),
            (t % 2 + e).cast("long").alias("rx_dropped"),
            (t % 12 + e).cast("long").alias("tx_bytes"),
            (t % 13 + e).cast("long").alias("tx_packets"),
            (t % 5 + e).cast("long").alias("tx_errors"),
            (t % 7 + e).cast("long").alias("tx_dropped")))
        blk = F.array(
            F.struct(F.lit("Read").alias("op"),
                     (t % 100 + e).cast("long").alias("value")),
            F.struct(F.lit("Write").alias("op"),
                     (t % 200 + e).cast("long").alias("value")),
            F.struct(F.lit("Read").alias("op"),
                     (t % 100 + e + 7).cast("long").alias("value")),
            F.struct(F.lit("Total").alias("op"),
                     F.lit(999).cast("long").alias("value")))
        return F.to_json(F.struct(
            F.lit("2020-08-25T10:00:02Z").alias("read"),
            F.lit("2020-08-25T10:00:00Z").alias("preread"),
            F.struct(
                F.struct(total.cast("long").alias("total_usage"),
                         (t % 10000 + e).cast("long")
                         .alias("usage_in_kernelmode"),
                         (t % 20000 + e).cast("long")
                         .alias("usage_in_usermode"),
                         F.array(F.lit(1).cast("long"),
                                 F.lit(2).cast("long"))
                         .alias("percpu_usage")).alias("cpu_usage"),
                (t % 900000 + e).cast("long").alias("system_cpu_usage"),
                F.lit(2).cast("long").alias("online_cpus"))
            .alias("cpu_stats"),
            F.struct(F.struct(pre.cast("long").alias("total_usage"))
                     .alias("cpu_usage")).alias("precpu_stats"),
            F.struct(((5 + e) * mib + t % mib).cast("long").alias("usage"),
                     (t % 7000 + e).cast("long").alias("max_usage"),
                     (t % 9000 + e).cast("long").alias("limit"),
                     F.create_map(F.lit("cache"),
                                  (t % mib).cast("long")).alias("stats"))
            .alias("memory_stats"),
            nic.alias("networks"),
            F.struct(((t % 100).cast("double") / F.lit(2.0) + e)
                     .alias("rx_bytes_per_sec"),
                     ((t % 50).cast("double") / F.lit(4.0) + e)
                     .alias("tx_bytes_per_sec"))
            .alias("network_rate_stats"),
            F.struct(blk.alias("io_service_bytes_recursive"))
            .alias("blkio_stats")))

    def con(e, name, mem_limit, cpu_limit):
        return F.struct(F.lit(name).alias("container_name"),
                        stats(e).alias("stats_json"),
                        mem_limit.cast("bigint").alias("mem_limit"),
                        cpu_limit.cast("double").alias("cpu_limit"))

    # both containers from ONE base pass (explode, no per-branch rescan)
    containers = (b.select(
        F.col("scrape_id").alias("task_id"),
        F.when(t % 3 != 0, F.lit(2048)).cast("bigint")
        .alias("task_mem_limit"),
        F.when(t % 2 != 0, F.lit(4.0)).cast("double")
        .alias("task_cpu_limit"),
        F.explode(F.array(con(0, "c0", t % 512, F.lit(256.0)),
                          con(1, "c1", t % 300, F.lit(None)))).alias("c"))
        .select("task_id", "c.container_name", "c.stats_json",
                "c.mem_limit", "c.cpu_limit", "task_mem_limit",
                "task_cpu_limit"))
    out = ecs_task_metrics(containers)
    return out.select(F.col("task_id").alias("scrape_id"), "name", "scope",
                      *METRIC_COLS)


def _ecs_oracle(d: str) -> str:
    mib = 1048576

    def vals(e):
        vcpu = f"(CAST(t % 300000 + 1000 * {e} AS DOUBLE)" \
               f" / CAST(2000000000 AS DOUBLE))"
        return {
            "memory_usage": f"({5 + e}) * {mib} + t % {mib}",
            "memory_max_usage": f"t % 7000 + {e}",
            "memory_limit": f"t % 9000 + {e}",
            "memory_utilized": f"CAST({5 + e} AS BIGINT)",
            "memory_reserved": f"t % 512" if e == 0 else "t % 300",
            "cpu_total_usage": f"(t % 50000) + t % 300000 + 1000 * {e}",
            "cpu_usage_kernelmode": f"t % 10000 + {e}",
            "cpu_usage_usermode": f"t % 20000 + {e}",
            "num_cpu_cores": "CAST(2 AS BIGINT)",
            "cpu_online_cpus": "CAST(2 AS BIGINT)",
            "system_cpu_usage": f"t % 900000 + {e}",
            "network_rx_bytes": f"t % 10 + {e}",
            "network_rx_packets": f"t % 11 + {e}",
            "network_rx_errors": f"t % 3 + {e}",
            "network_rx_dropped": f"t % 2 + {e}",
            "network_tx_bytes": f"t % 12 + {e}",
            "network_tx_packets": f"t % 13 + {e}",
            "network_tx_errors": f"t % 5 + {e}",
            "network_tx_dropped": f"t % 7 + {e}",
            "storage_read_bytes": f"t % 100 + {e} + 7",
            "storage_write_bytes": f"t % 200 + {e}",
            "cpu_usage_vcpu": vcpu,
            "network_rate_rx": f"(CAST(t % 100 AS DOUBLE) / 2.0 + {e})",
            "network_rate_tx": f"(CAST(t % 50 AS DOUBLE) / 4.0 + {e})",
            "cpu_reserved": "256.0" if e == 0 else "0.0",
            "cpu_utilized": (f"({vcpu} * 100.0 / 256.0)" if e == 0
                             else f"({vcpu} * 100.0)"),
        }

    from .operators.ecs_metrics import METRIC_COLS
    int_cols = set(METRIC_COLS[:21])

    def arm(name, scope, v):
        cols = []
        for c in METRIC_COLS:
            expr = v[c]
            cast = "BIGINT" if c in int_cols else "DOUBLE"
            cols.append(f"CAST({expr} AS {cast}) AS {c}")
        return (f"  SELECT scrape_id, {name} AS name, '{scope}' AS scope,\n"
                + ",\n".join("         " + c for c in cols) + "\n  FROM base")

    v0, v1 = vals(0), vals(1)
    vcpu_sum = f"({v0['cpu_usage_vcpu']} + {v1['cpu_usage_vcpu']})"
    task_res = "CASE WHEN t % 2 <> 0 THEN 4.0 ELSE 256.0 / 1024 END"
    vt = {c: f"({v0[c]}) + ({v1[c]})" for c in METRIC_COLS}
    vt["memory_reserved"] = ("CASE WHEN t % 3 <> 0 THEN 2048"
                             " ELSE (t % 512) + (t % 300) END")
    vt["cpu_reserved"] = task_res
    vt["cpu_usage_vcpu"] = vcpu_sum
    vt["cpu_utilized"] = f"({vcpu_sum} / ({task_res}) * 100.0)"
    arms = [arm("'c0'", "container", v0), arm("'c1'", "container", v1),
            arm("scrape_id", "task", vt)]
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# kubeletstats (accumulator.go:60-158)
# ---------------------------------------------------------------------------
# entity multipliers for the deterministic field-value function
_KS_E = {"node": 1, "pod0": 2, "pod1": 3, "cont0": 4, "cont1": 5, "vol0": 6}
# canonical field index within an entity's summary subtree
_KS_F = {"usageNanoCores": 0, "usageCoreNanoSeconds": 1,
         "m.availableBytes": 2, "m.usageBytes": 3, "m.rssBytes": 4,
         "m.workingSetBytes": 5, "m.pageFaults": 6, "m.majorPageFaults": 7,
         "f.availableBytes": 8, "f.capacityBytes": 9, "f.usedBytes": 10,
         "rxBytes": 11, "txBytes": 12, "rxErrors": 13, "txErrors": 14,
         "v.availableBytes": 0, "v.capacityBytes": 1, "v.inodes": 2,
         "v.inodesFree": 3, "v.inodesUsed": 4}
# shared battery spec: field -> (metric suffix, type, units, direction)
_KS_BATTERY = [
    ("usageNanoCores", "cpu.utilization", "gauge", "1", None),
    ("usageCoreNanoSeconds", "cpu.time", "cumulative", "s", None),
    ("m.availableBytes", "memory.available", "gauge", "By", None),
    ("m.usageBytes", "memory.usage", "gauge", "By", None),
    ("m.rssBytes", "memory.rss", "gauge", "By", None),
    ("m.workingSetBytes", "memory.working_set", "gauge", "By", None),
    ("m.pageFaults", "memory.page_faults", "gauge", "1", None),
    ("m.majorPageFaults", "memory.major_page_faults", "gauge", "1", None),
    ("f.availableBytes", "filesystem.available", "gauge", "By", None),
    ("f.capacityBytes", "filesystem.capacity", "gauge", "By", None),
    ("f.usedBytes", "filesystem.usage", "gauge", "By", None),
    ("rxBytes", "network.io", "cumulative", "By", "receive"),
    ("txBytes", "network.io", "cumulative", "By", "transmit"),
    ("rxErrors", "network.errors", "cumulative", "1", "receive"),
    ("txErrors", "network.errors", "cumulative", "1", "transmit"),
]
_KS_VOL = [("v.availableBytes", "available", "By"),
           ("v.capacityBytes", "capacity", "By"),
           ("v.inodes", "inodes", "1"),
           ("v.inodesFree", "inodes.free", "1"),
           ("v.inodesUsed", "inodes.used", "1")]


def _ks_val(t, entity, field):
    e, f = _KS_E[entity], _KS_F[field]
    return (t * e + 13 * f) % 99991


def _ks_val_sql(entity, field):
    e, f = _KS_E[entity], _KS_F[field]
    return f"((t * {e} + 13 * {f}) % 99991)"


def q_kubelet_stats(spark, sf_dir, tok_dir) -> DataFrame:
    """kubeletstats summary translation: one summary per scrape with a
    node, pod-0 (container + volume), and a conditional pod-1 (t%3==0);
    node memory.availableBytes is nil every 7th scrape (nil fields emit
    no metric)."""
    from .operators.kubeletstats import parse_kubelet_summary
    b = _base(spark, tok_dir)
    t = F.col("t")

    def lng(v):
        return v.cast("long")

    def cpu(e):
        return F.struct(
            lng(_ks_val(t, e, "usageNanoCores")).alias("usageNanoCores"),
            lng(_ks_val(t, e, "usageCoreNanoSeconds"))
            .alias("usageCoreNanoSeconds"))

    def mem(e, cond_avail=False):
        avail = lng(_ks_val(t, e, "m.availableBytes"))
        if cond_avail:
            avail = F.when(t % 7 != 0, avail)
        return F.struct(
            avail.alias("availableBytes"),
            lng(_ks_val(t, e, "m.usageBytes")).alias("usageBytes"),
            lng(_ks_val(t, e, "m.rssBytes")).alias("rssBytes"),
            lng(_ks_val(t, e, "m.workingSetBytes")).alias("workingSetBytes"),
            lng(_ks_val(t, e, "m.pageFaults")).alias("pageFaults"),
            lng(_ks_val(t, e, "m.majorPageFaults")).alias("majorPageFaults"))

    def fs(e):
        return F.struct(
            lng(_ks_val(t, e, "f.availableBytes")).alias("availableBytes"),
            lng(_ks_val(t, e, "f.capacityBytes")).alias("capacityBytes"),
            lng(_ks_val(t, e, "f.usedBytes")).alias("usedBytes"))

    def net(e):
        return F.struct(
            F.lit("eth0").alias("name"),
            lng(_ks_val(t, e, "rxBytes")).alias("rxBytes"),
            lng(_ks_val(t, e, "txBytes")).alias("txBytes"),
            lng(_ks_val(t, e, "rxErrors")).alias("rxErrors"),
            lng(_ks_val(t, e, "txErrors")).alias("txErrors"))

    def cont(name, e):
        return F.struct(F.lit(name).alias("name"), cpu(e).alias("cpu"),
                        mem(e).alias("memory"), fs(e).alias("rootfs"))

    vol0 = F.struct(
        F.lit("vol-1").alias("name"),
        lng(_ks_val(t, "vol0", "v.availableBytes")).alias("availableBytes"),
        lng(_ks_val(t, "vol0", "v.capacityBytes")).alias("capacityBytes"),
        lng(_ks_val(t, "vol0", "v.inodes")).alias("inodes"),
        lng(_ks_val(t, "vol0", "v.inodesFree")).alias("inodesFree"),
        lng(_ks_val(t, "vol0", "v.inodesUsed")).alias("inodesUsed"))

    def pod(name, e, conts, vols):
        return F.struct(
            F.struct(F.lit(name).alias("name"), F.lit("ns1").alias(
                "namespace"), F.lit("u-" + name).alias("uid")).alias(
                    "podRef"),
            cpu(e).alias("cpu"), mem(e).alias("memory"),
            fs(e).alias("ephemeral-storage"), net(e).alias("network"),
            F.array(*conts).alias("containers"),
            (F.array(*vols) if vols else
             F.array().cast("array<struct<name:string,availableBytes:long,"
                            "capacityBytes:long,inodes:long,inodesFree:long,"
                            "inodesUsed:long>>")).alias("volume"))

    pod0 = pod("pod-0", "pod0", [cont("app", "cont0")], [vol0])
    pod1 = pod("pod-1", "pod1", [cont("app", "cont1")], [])
    summary = F.struct(
        F.struct(F.lit("node-1").alias("nodeName"),
                 cpu("node").alias("cpu"),
                 mem("node", cond_avail=True).alias("memory"),
                 fs("node").alias("fs"),
                 net("node").alias("network")).alias("node"),
        F.when(t % 3 == 0, F.array(pod0, pod1))
         .otherwise(F.array(pod0)).alias("pods"))
    payloads = b.select("scrape_id", F.to_json(summary).alias("summary_json"))
    return parse_kubelet_summary(payloads)


def _kubelet_oracle(d: str) -> str:
    NUL = "CAST(NULL AS VARCHAR)"

    def arm(grp, prefix, entity, pod_name=NUL, cont=NUL, cond="",
            battery=None, vol=False):
        out = []
        if vol:
            for fld, suffix, units in _KS_VOL:
                out.append(f"""  SELECT scrape_id, 'volume' AS grp,
         'k8s.volume.{suffix}' AS metric_name, 'gauge' AS metric_type,
         '{units}' AS units, 'node-1' AS node_name, {pod_name} AS pod_name,
         'ns1' AS namespace, {NUL} AS container_name,
         'vol-1' AS volume_name, {NUL} AS interface, {NUL} AS direction,
         {_ks_val_sql(entity, fld)} AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base {cond}""")
            return out
        ns = NUL if grp == "node" else "'ns1'"
        for fld, suffix, mtype, units, direction in battery:
            v = _ks_val_sql(entity, fld)
            if suffix.startswith("cpu."):
                vi, vd = "CAST(NULL AS BIGINT)", \
                    f"CAST({v} AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
            else:
                vi, vd = v, "CAST(NULL AS DOUBLE)"
            iface = "'eth0'" if direction else NUL
            dirn = f"'{direction}'" if direction else NUL
            c = cond
            if grp == "node" and fld == "m.availableBytes":
                c = (cond + " AND t % 7 <> 0") if cond else "WHERE t % 7 <> 0"
            out.append(f"""  SELECT scrape_id, '{grp}' AS grp,
         '{prefix}{suffix}' AS metric_name, '{mtype}' AS metric_type,
         '{units}' AS units, 'node-1' AS node_name, {pod_name} AS pod_name,
         {ns} AS namespace, {cont} AS container_name,
         {NUL} AS volume_name, {iface} AS interface, {dirn} AS direction,
         {vi} AS value_i, {vd} AS value_d
  FROM base {c}""")
        return out

    cont_battery = [x for x in _KS_BATTERY if x[4] is None]  # no network
    arms = (
        arm("node", "k8s.node.", "node", battery=_KS_BATTERY)
        + arm("pod", "k8s.pod.", "pod0", pod_name="'pod-0'",
              battery=_KS_BATTERY)
        + arm("pod", "k8s.pod.", "pod1", pod_name="'pod-1'",
              cond="WHERE t % 3 = 0", battery=_KS_BATTERY)
        + arm("container", "container.", "cont0", pod_name="'pod-0'",
              cont="'app'", battery=cont_battery)
        + arm("container", "container.", "cont1", pod_name="'pod-1'",
              cont="'app'", cond="WHERE t % 3 = 0", battery=cont_battery)
        + arm("volume", "", "vol0", pod_name="'pod-0'", vol=True)
    )
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# signalfx translation rules (translator.go:27-121, battery analog)
# ---------------------------------------------------------------------------

def q_sfx_translation(spark, sf_dir, tok_dir) -> DataFrame:
    """signalfx metric-translation battery: a 5-datapoint batch per
    scrape pushed through 10 of the 12 rule actions in order
    (rename_dimension_keys, calculate_new_metric, rename_metrics +
    add_dimensions, multiply_int, divide_int, multiply_float,
    convert_values, split_metric, aggregate_metric, drop_metrics);
    delta_metric and count-aggregation are pytest-covered (they need
    cross-batch state / multi-point groups)."""
    from .operators.sfx_translation import (SfxRule, dims_signature,
                                            translate_datapoints)
    b = _base(spark, tok_dir)
    t = F.col("t")
    host = F.concat(F.lit("h"), _s(t % 3))
    direction = F.when(t % 2 == 0, F.lit("receive")) \
                 .otherwise(F.lit("transmit"))

    def dp(metric, mtype, dims, vi, vd):
        # one struct per datapoint: the 5-point batch is a single
        # explode over ONE base pass (no per-branch rescan/re-distinct)
        return F.struct(
            F.lit(metric).alias("metric"), F.lit(mtype).alias("metric_type"),
            dims.alias("dims"), vi.cast("bigint").alias("value_i"),
            vd.cast("double").alias("value_d"))

    nul_i = F.lit(None).cast("bigint")
    nul_d = F.lit(None).cast("double")
    batch = F.array(
        dp("cpu.utilization_per_core", "gauge",
           F.create_map(F.lit("cpu"), F.concat(F.lit("cpu"), _s(t % 2)),
                        F.lit("host"), host, F.lit("iface"), F.lit("eth0")),
           nul_i, F.col("vs").cast("double")),
        dp("memory.used", "gauge", F.create_map(F.lit("host"), host),
           t % 1000000, nul_d),
        dp("memory.total", "gauge", F.create_map(F.lit("host"), host),
           F.lit(4000000), nul_d),
        dp("network.io", "cumulative",
           F.create_map(F.lit("host"), host, F.lit("direction"), direction,
                        F.lit("iface"), F.lit("eth0")),
           t % 5000, nul_d),
        dp("temp.junk", "gauge", F.create_map(F.lit("k"), F.lit("v")),
           F.lit(1), nul_d))
    dps = (b.select("scrape_id", t.alias("ts"),
                    F.explode(batch).alias("dp"))
           .select("scrape_id", "dp.metric", "dp.metric_type", "dp.dims",
                   "dp.value_i", "dp.value_d", "ts"))

    out = translate_datapoints(dps, [
        SfxRule("rename_dimension_keys", mapping={"iface": "interface"}),
        SfxRule("calculate_new_metric", metric_name="memory.utilization",
                operand1_metric="memory.used",
                operand2_metric="memory.total", operator="/"),
        SfxRule("rename_metrics", mapping={"memory.used": "memory.usage"},
                add_dimensions={"src": "otel"}),
        SfxRule("multiply_int", scale_factors_int={"network.io": 2}),
        SfxRule("divide_int", scale_factors_int={"memory.total": 1000}),
        SfxRule("multiply_float",
                scale_factors_float={"cpu.utilization_per_core": 10.0}),
        SfxRule("convert_values",
                types_mapping={"cpu.utilization_per_core": "int"}),
        SfxRule("split_metric", metric_name="network.io",
                dimension_key="direction",
                mapping={"receive": "network.receive",
                         "transmit": "network.transmit"}),
        SfxRule("aggregate_metric", metric_name="cpu.utilization_per_core",
                aggregation_method="sum", without_dimensions=["cpu"]),
        SfxRule("drop_metrics", metric_names={"temp.junk"}),
    ])
    return out.select("scrape_id", "metric", "metric_type",
                      dims_signature(F.col("dims")).alias("dims_s"),
                      "value_i", "value_d")


def _sfx_oracle(d: str) -> str:
    host = "'h' || CAST(t % 3 AS VARCHAR)"
    arms = [
        # cpu: *10.0 then int64() truncation, cpu dim aggregated away
        f"""  SELECT scrape_id, 'cpu.utilization_per_core' AS metric,
         'gauge' AS metric_type,
         'host:' || {host} || '//interface:eth0' AS dims_s,
         CAST(trunc(CAST(vs AS DOUBLE) * 10.0) AS BIGINT) AS value_i,
         CAST(NULL AS DOUBLE) AS value_d
  FROM base""",
        f"""  SELECT scrape_id, 'memory.usage' AS metric, 'gauge' AS metric_type,
         'host:' || {host} || '//src:otel' AS dims_s,
         t % 1000000 AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base""",
        f"""  SELECT scrape_id, 'memory.total' AS metric, 'gauge' AS metric_type,
         'host:' || {host} AS dims_s,
         CAST(4000 AS BIGINT) AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base""",
        f"""  SELECT scrape_id, 'memory.utilization' AS metric,
         'gauge' AS metric_type, 'host:' || {host} AS dims_s,
         CAST(NULL AS BIGINT) AS value_i,
         CAST(t % 1000000 AS DOUBLE) / CAST(4000000 AS DOUBLE) AS value_d
  FROM base""",
        f"""  SELECT scrape_id,
         CASE WHEN t % 2 = 0 THEN 'network.receive'
              ELSE 'network.transmit' END AS metric,
         'cumulative' AS metric_type,
         'host:' || {host} || '//interface:eth0' AS dims_s,
         (t % 5000) * 2 AS value_i, CAST(NULL AS DOUBLE) AS value_d
  FROM base""",
    ]
    return (f"WITH {_base_sql(d)}\n" + "\nUNION ALL\n".join(arms))


# ---------------------------------------------------------------------------
# awsemf exporter (metric_translator.go)
# ---------------------------------------------------------------------------

def q_emf_events(spark, sf_dir, tok_dir) -> DataFrame:
    """EMF serialization battery: label cardinality (1 vs 2 labels —
    exercising the single-label full-set dedup), conditional
    instrumentation lib, and the namespace precedence chain all vary
    with t; dimension sets serialized for the canon."""
    from .sinks.emf import emf_events
    b = _base(spark, tok_dir)
    t = F.col("t")
    labels = (F.when(t % 2 == 0,
                     F.create_map(F.lit("host"),
                                  F.concat(F.lit("h"), _s(t % 3)),
                                  F.lit("dc"), F.lit("us")))
              .otherwise(F.create_map(F.lit("host"),
                                      F.concat(F.lit("h"), _s(t % 3)))))
    dps = b.select(
        "scrape_id", F.lit("latency").alias("metric_name"),
        F.lit("ms").alias("unit"), F.lit(None).cast("long").alias("value_i"),
        F.col("vs").cast("double").alias("value_d"),
        (t * 1000).alias("ts_ms"), labels.alias("labels"),
        F.when(t % 5 != 0, F.lit("mylib")).alias("instrumentation_lib"),
        F.lit("svc").alias("service_name"),
        F.when(t % 7 != 0, F.lit("myns")).alias("service_namespace"))
    out = emf_events(dps)
    meas = F.col("emf._aws.CloudWatchMetrics")[0]
    dims_s = F.array_join(
        F.transform(meas["Dimensions"], lambda d: F.array_join(d, "+")),
        "|")
    return out.select(
        "scrape_id", meas["Namespace"].alias("namespace"),
        dims_s.alias("dims_s"),
        meas["Metrics"][0]["Name"].alias("metric"),
        meas["Metrics"][0]["Unit"].alias("unit"),
        F.col("emf.value").alias("value"),
        F.col("emf._aws.Timestamp").alias("ts_ms"),
        F.element_at(F.col("emf.fields"), "OTelLib").alias("otellib"))


def _emf_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
       CASE WHEN t % 7 <> 0 THEN 'myns/svc' ELSE 'svc' END AS namespace,
       CASE
         WHEN t % 2 = 0 AND t % 5 <> 0
           THEN 'dc+host+OTelLib|OTelLib|OTelLib+dc|OTelLib+host'
         WHEN t % 2 = 0 THEN 'dc+host||dc|host'
         WHEN t % 5 <> 0 THEN 'OTelLib|OTelLib+host'
         ELSE '|host' END AS dims_s,
       'latency' AS metric, 'ms' AS unit,
       CAST(vs AS DOUBLE) AS value, t * 1000 AS ts_ms,
       CASE WHEN t % 5 <> 0 THEN 'mylib' END AS otellib
FROM base"""


# ---------------------------------------------------------------------------
# training-set curation: packing + decontamination (datapipe/curation.py)
# ---------------------------------------------------------------------------

def q_pack_chunks(spark, sf_dir, tok_dir) -> DataFrame:
    """GPT-style concat-and-split packing of the tokens table into
    2048-token context windows, 16 independent md5-derived groups."""
    from .datapipe.curation import pack_chunks
    toks = spark.read.parquet(os.path.join(tok_dir, "tokens.parquet"))
    return pack_chunks(toks.select("doc_id", "n_tok"), budget=2048,
                       n_groups=16)


def _pack_oracle(d: str) -> str:
    return f"""WITH t AS (
  SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
         CAST(CAST('0x' || substr(md5(doc_id), 1, 8) AS BIGINT) % 16
              AS INT) AS grp
  FROM read_parquet('{d}/tokens.parquet')
), c AS (
  SELECT doc_id, grp, n,
         sum(n) OVER (PARTITION BY grp ORDER BY doc_id
                      ROWS UNBOUNDED PRECEDING) - n AS prev
  FROM t
)
SELECT doc_id, grp, n AS n_tok,
       CAST(prev // 2048 AS BIGINT) AS first_chunk,
       CAST((prev + greatest(n - 1, 0)) // 2048 AS BIGINT) AS last_chunk,
       CAST(prev % 2048 AS BIGINT) AS chunk_offset
FROM c"""


def q_pq_codes(spark, sf_dir, tok_dir) -> DataFrame:
    """Product-quantization encode of the embeddings table (4 subspaces
    x 4 codes, deterministic seeded codebooks): code vector + exact
    reconstruction error, oracle-checked against inlined codebook
    expressions."""
    from .datapipe.pq import pq_encode
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    out = pq_encode(emb, dim=64)
    return out.select(
        "id",
        F.concat_ws(",", F.col("codes").cast("array<string>"))
        .alias("codes_s"),
        F.round("recon_err", 6).alias("recon_err"))


def _pq_oracle(d: str) -> str:
    from .datapipe.pq import pq_encode_sql
    from .queries_ext import _VEC_CTE   # runtime import (no cycle)
    codes = " || ',' || ".join(f"CAST(c{m} AS VARCHAR)" for m in range(4))
    return f"""WITH {_VEC_CTE}, {pq_encode_sql(64)}
SELECT id, {codes} AS codes_s, round(recon_err, 6) AS recon_err
FROM pq_e"""


def q_pq_adc(spark, sf_dir, tok_dir) -> DataFrame:
    """PQ asymmetric-distance search: first 3 ids as queries against
    the coded table, top-3 by ADC distance."""
    from .datapipe.pq import pq_adc_topk
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return pq_adc_topk(emb, dim=64, n_queries=3, topk=3)


def _pq_adc_oracle(d: str) -> str:
    from .datapipe.pq import M_SUB, K_CODES, _sub_dist_sql
    from .queries_ext import _VEC_CTE
    from .datapipe.pq import pq_encode_sql
    # ADC per (query q, coded row t): per subspace a CASE over t's code
    # selecting the q-subvector-to-centroid distance; left-assoc sum
    terms = []
    for mi in range(M_SUB):
        cases = " ".join(
            f"WHEN t.c{mi} = {c} THEN ({_sub_dist_sql(mi, c, 64, M_SUB)})"
            for c in range(K_CODES))
        terms.append(f"(CASE {cases} END)")
    dist = terms[0]
    for t in terms[1:]:
        dist = f"({dist} + {t})"
    # the distance expressions reference q's vector as plain v
    dist = dist.replace("v[", "q.v[")
    return f"""WITH {_VEC_CTE}, {pq_encode_sql(64)},
scored AS (
  SELECT q.id AS query_id, t.id AS neighbor_id,
         round({dist}, 6) AS adc_dist
  FROM nv q JOIN pq_e t ON q.id < 3 AND q.id <> t.id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, neighbor_id) AS rank
FROM scored QUALIFY rank <= 3"""


def q_ivfpq(spark, sf_dir, tok_dir) -> DataFrame:
    """IVF-PQ composite search (IVFADC): coarse lists prune the
    candidate set, ADC over PQ codes scores it — the full
    billion-vector recipe, oracle-checked end-to-end (inlined centroid
    assignment + probe-2 candidates + CASE-chain ADC distances)."""
    from .datapipe.pq import ivfpq_topk
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return ivfpq_topk(emb, dim=64, n_queries=3, topk=3)


def _ivfpq_oracle(d: str) -> str:
    from .datapipe.ivf import ivf_assign_sql, ivf_probe2_sql
    from .datapipe.pq import ivfpq_adc_dist_sql, pq_encode_sql
    from .queries_ext import _VEC_CTE
    dist = ivfpq_adc_dist_sql(64)
    return f"""WITH {_VEC_CTE}, {ivf_assign_sql(64)}, {pq_encode_sql(64)},
probed AS (
  SELECT id, list_id, {ivf_probe2_sql()} AS probe2 FROM ivf_a
), qprobes AS (
  SELECT id, list_id AS probe FROM probed
  UNION ALL
  SELECT id, probe2 FROM probed
), cand AS (
  SELECT qp.id AS query_id, t2.id AS neighbor_id
  FROM qprobes qp JOIN ivf_a t2 ON qp.probe = t2.list_id AND qp.id <> t2.id
  WHERE qp.id < 3
), scored AS (
  SELECT c.query_id, c.neighbor_id, round({dist}, 6) AS adc_dist
  FROM cand c JOIN nv q ON q.id = c.query_id
              JOIN pq_e t ON t.id = c.neighbor_id
)
SELECT query_id, neighbor_id, adc_dist,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY adc_dist, neighbor_id) AS rank
FROM scored QUALIFY rank <= 3"""


def q_domain_filter(spark, sf_dir, tok_dir) -> DataFrame:
    """Domain-blocklist curation: URLs appended deterministically to the
    documents (none contain URLs natively), every third doc citing a
    blocklisted domain."""
    from .datapipe.curation import domain_blocklist_filter
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    did = F.col("doc_id")
    tld = F.when(did % 2 == 0, F.lit(".com")).otherwise(F.lit(".org"))
    corpus = docs.select("doc_id", F.concat(
        F.col("text"), F.lit(" https://h"), _s(did % 5),
        F.lit(".example"), tld, F.lit("/x"),
        F.when(did % 3 == 0, F.lit(" http://w.blocked.bad.net/p"))
         .otherwise(F.lit(""))).alias("text"))
    bl = spark.createDataFrame([("bad.net",)], "domain string")
    return domain_blocklist_filter(corpus, bl)


def _domain_oracle(d: str) -> str:
    return """SELECT doc_id AS id,
       CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS n_domains,
       CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END::BIGINT AS n_blocked,
       doc_id % 3 = 0 AS blocked
FROM documents"""


def q_rarity(spark, sf_dir, tok_dir) -> DataFrame:
    """Corpus-frequency rarity scoring (LM-quality-filter skeleton):
    exact unigram counts then a per-word score join."""
    from .datapipe.lm_score import rarity_scores
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    return rarity_scores(docs, rare_max_count=2)


def _rarity_oracle(d: str) -> str:
    from .queries_ext import WORDS_SQL   # runtime import (no cycle)
    return f"""WITH w AS (
  SELECT doc_id, {WORDS_SQL} AS words FROM documents
), ex AS (
  SELECT doc_id, unnest(words) AS word FROM w
), freq AS (
  SELECT word, count(*)::BIGINT AS n FROM ex GROUP BY word
), j AS (
  SELECT e.doc_id, f.n FROM ex e JOIN freq f USING (word)
), agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_words,
         sum(CASE WHEN n <= 2 THEN 1 ELSE 0 END)::BIGINT AS n_rare,
         min(n) AS min_count, sum(n)::BIGINT AS sum_count
  FROM j GROUP BY doc_id)
SELECT w.doc_id AS id,
       coalesce(a.n_words, 0)::BIGINT AS n_words,
       coalesce(a.n_rare, 0)::BIGINT AS n_rare,
       CASE WHEN coalesce(a.n_words, 0) > 0
            THEN CAST(a.n_rare AS DOUBLE) / CAST(a.n_words AS DOUBLE)
            ELSE 0.0 END AS rare_frac,
       a.min_count, coalesce(a.sum_count, 0)::BIGINT AS sum_count
FROM w LEFT JOIN agg a USING (doc_id)"""


def q_contamination(spark, sf_dir, tok_dir) -> DataFrame:
    """Decontamination: word-3-gram overlap of every train doc
    (doc_id%50 != 0) against the held-out benchmark subset
    (doc_id%50 == 0)."""
    from .datapipe.curation import contamination
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")) \
        .select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 50 != 0)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    return contamination(train, bench, k=3)


def _contamination_oracle(d: str) -> str:
    from .queries_ext import WORDS_SQL   # runtime import (no cycle)
    return f"""WITH w AS (
  SELECT doc_id, {WORDS_SQL} AS words FROM documents
), sh AS (
  SELECT doc_id, list_distinct([array_to_string(words[i:i+2], ' ')
       for i in generate_series(1, greatest(len(words) - 2, 0))]) AS sh
  FROM w
), train AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
bench_g AS (SELECT DISTINCT unnest(sh) AS g FROM sh WHERE doc_id % 50 = 0),
ex AS (SELECT doc_id, unnest(sh) AS g FROM train),
hits AS (
  SELECT doc_id, count(DISTINCT g)::BIGINT AS n_overlap
  FROM ex WHERE g IN (SELECT g FROM bench_g) GROUP BY doc_id)
SELECT t.doc_id AS id, CAST(len(t.sh) AS INT) AS n_shingles,
       coalesce(h.n_overlap, 0)::BIGINT AS n_overlap,
       coalesce(h.n_overlap, 0) > 0 AS contaminated
FROM train t LEFT JOIN hits h USING (doc_id)"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------



# ---------------------------------------------------------------------------
# dynatrace exporter (sinks/dynatrace.py)
# ---------------------------------------------------------------------------

def q_dynatrace(spark, sf_dir, tok_dir) -> DataFrame:
    """Dynatrace line-protocol battery over the distinct carbon lines:
    gauge_int with dirty labels (case-fold + charset + skip-on-empty
    key), gauge_double with a trailing-underscore name, and int/double
    histograms whose groups are sometimes poisoned by a zero-count
    datapoint (the reference's slice-level ``return ""``).  Names pass
    through NormalizeString with prefix 'otelcol'."""
    from .sinks.dynatrace import dynatrace_lines
    c = (spark.read.parquet(os.path.join(tok_dir, "carbon.parquet"))
         .select("line").distinct())
    parts = F.split(F.col("line"), " ")
    base = c.select(
        F.element_at(F.split(F.element_at(parts, 1), ";"), 1).alias("mname"),
        F.element_at(parts, 2).alias("vs"),
        F.element_at(parts, 3).cast("bigint").alias("t"),
        F.conv(F.substring(F.md5(F.col("line")), 1, 6), 16, 10)
        .cast("bigint").alias("h"))
    base = base.repartition(spark.sparkContext.defaultParallelism)
    t, h = F.col("t"), F.col("h")
    v = F.col("vs").cast("double")
    NULI = F.lit(None).cast("bigint")
    NULD = F.lit(None).cast("double")

    def dp(name, dtype, vi, vd, hs, hsi, hc, labels):
        return F.struct(
            name.alias("name"), F.lit(dtype).alias("dtype"),
            vi.cast("bigint").alias("value_i"),
            vd.cast("double").alias("value_d"),
            hs.cast("double").alias("hist_sum"),
            hsi.cast("bigint").alias("hist_sum_i"),
            hc.cast("bigint").alias("hist_count"),
            (t * F.lit(1000000000)).cast("bigint").alias("ts_ns"),
            labels.alias("labels"))

    lab1 = F.create_map(
        F.lit("Host!Name"),
        F.concat(F.lit('h"x\\'), (h % 8).cast("string")),
        F.lit("DC"), F.lit("us-east"),
        F.lit("__9"), F.lit("dropped"))
    lab2 = F.create_map(F.lit("ok"), F.lit("plain"))
    lab0 = F.expr("cast(map() as map<string,string>)")
    gi_name = (F.when(h % 17 == 0, F.lit("_12."))       # normalizes empty
               .otherwise(F.concat(F.lit("svc/"), F.col("mname"),
                                   F.lit("@"), (h % 3).cast("string"))))
    gd_name = F.concat(F.lit("svc/"), F.col("mname"), F.lit("/"))
    hd_name = F.concat(F.lit("hist.d."), (h % 2000).cast("string"))
    hi_name = F.concat(F.lit("hist.i."), (h % 2000).cast("string"))
    arr = F.array(
        dp(gi_name, "gauge_int", t % 100000, NULD, NULD, NULI, NULI, lab1),
        dp(gd_name, "gauge_double", NULI, v, NULD, NULI, NULI, lab2),
        dp(hd_name, "hist_double", NULI, NULD, v * 2, NULI,
           F.when(h % 997 == 0, F.lit(0)).otherwise(F.lit(2)), lab0),
        dp(hi_name, "hist_int", NULI, NULD, NULD, t % 1000,
           F.when(h % 991 == 0, F.lit(0)).otherwise(F.lit(2)), lab0))
    df = base.select(F.explode(arr).alias("d")).select("d.*")
    return dynatrace_lines(df, prefix="otelcol", tags=("source=spark",))


def _dynatrace_oracle(d: str) -> str:
    # the oracle re-implements the normalization/escape/float spec in
    # DuckDB SQL (independent engine), and the group-poisoning drop via
    # a window — expectations derive from (mname, vs, t, h) only
    esc = r"""replace(replace({0}, '"', '\"'), '\', '\\')"""
    val = esc.format(r"""'h"x\' || CAST(h%8 AS VARCHAR)""")
    flt = ("CASE WHEN rtrim(printf('%.6f', {0}), '0.') = '' THEN '0' "
           "ELSE rtrim(printf('%.6f', {0}), '0.') END")
    return f"""WITH c AS (SELECT DISTINCT line
           FROM read_parquet('{d}/carbon.parquet')),
base AS (
  SELECT string_split(string_split(line, ' ')[1], ';')[1] AS mname,
         string_split(line, ' ')[2] AS vs,
         CAST(string_split(line, ' ')[3] AS BIGINT) AS t,
         CAST(('0x' || substr(md5(line), 1, 6)) AS BIGINT) AS h
  FROM c
),
gauge_i AS (
  SELECT 'otelcol.svc_' || mname || '_' || CAST(h%3 AS VARCHAR) AS name,
         'otelcol.svc_' || mname || '_' || CAST(h%3 AS VARCHAR)
         || ',source=spark,dc="us-east",host_name="' || {val} || '" '
         || CAST(t % 100000 AS VARCHAR) || ' ' || CAST(t*1000 AS VARCHAR)
             AS line
  FROM base WHERE h % 17 <> 0
),
gauge_d AS (
  SELECT 'otelcol.svc_' || mname AS name,
         'otelcol.svc_' || mname || ',source=spark,ok="plain" '
         || {flt.format('CAST(vs AS DOUBLE)')} || ' '
         || CAST(t*1000 AS VARCHAR) AS line
  FROM base
),
hd AS (
  SELECT *, max(CASE WHEN h % 997 = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY h % 2000) AS poisoned
  FROM base
),
hist_d AS (
  SELECT 'otelcol.hist.d.' || CAST(h%2000 AS VARCHAR) AS name,
         'otelcol.hist.d.' || CAST(h%2000 AS VARCHAR)
         || ',source=spark gauge,min=' || {flt.format('CAST(vs AS DOUBLE)')}
         || ',max=' || {flt.format('CAST(vs AS DOUBLE)')}
         || ',sum=' || {flt.format('CAST(vs AS DOUBLE) * 2')}
         || ',count=2 ' || CAST(t*1000 AS VARCHAR) AS line
  FROM hd WHERE poisoned = 0
),
hi AS (
  SELECT *, max(CASE WHEN h % 991 = 0 THEN 1 ELSE 0 END)
              OVER (PARTITION BY h % 2000) AS poisoned
  FROM base
),
hist_i AS (
  SELECT 'otelcol.hist.i.' || CAST(h%2000 AS VARCHAR) AS name,
         'otelcol.hist.i.' || CAST(h%2000 AS VARCHAR)
         || ',source=spark gauge,min='
         || {flt.format('CAST(t % 1000 AS DOUBLE) / 2')}
         || ',max=' || {flt.format('CAST(t % 1000 AS DOUBLE) / 2')}
         || ',sum=' || CAST(t % 1000 AS VARCHAR)
         || ',count=2 ' || CAST(t*1000 AS VARCHAR) AS line
  FROM hi WHERE poisoned = 0
)
SELECT name, line FROM gauge_i
UNION ALL SELECT name, line FROM gauge_d
UNION ALL SELECT name, line FROM hist_d
UNION ALL SELECT name, line FROM hist_i"""




# ---------------------------------------------------------------------------
# sentry exporter (sinks/sentry.py)
# ---------------------------------------------------------------------------

def q_sentry(spark, sf_dir, tok_dir) -> DataFrame:
    """Sentry transaction assembly over synthesized 5-span traces: a
    root (sometimes replaced by a missing parent so the whole trace
    orphans), a 2-deep child chain (exercises the fixed-point
    re-classification), a missing-parent orphan, and a child of that
    orphan (stays an orphan).  Span attrs cycle through the descriptor
    priority chain; status codes exercise in-range and out-of-range."""
    from .sinks.sentry import convert_spans, sentry_transactions
    b = _base(spark, tok_dir)
    t = F.col("t")

    def sid(k):
        return F.substring(
            F.md5(F.concat(F.col("scrape_id"), F.lit(f"#{k}"))), 1, 16)

    def nm(k):
        return F.concat(F.lit(f"nm{k}_"), _s(t % 3))

    def mp(*kv):
        return F.create_map(*[F.lit(x) if isinstance(x, str) else x
                              for x in kv])

    def span(k, parent, attrs, kind, code, msg):
        return F.struct(
            sid(k).alias("span_id"), parent.alias("parent_span_id"),
            nm(k).alias("name"), kind.alias("kind"),
            (t * 1000000000 + k).cast("long").alias("start_ns"),
            (t * 1000000000 + k + 1500000000).cast("long").alias("end_ns"),
            code.cast("int").alias("status_code"),
            msg.alias("status_message"), attrs.alias("attrs"))

    NS = F.lit(None).cast("string")
    s0 = span(0, F.when(t % 5 == 0, F.lit("ffffffffffffffff"))
              .otherwise(F.lit("")),
              mp("http.method", "GET", "server_name", "span-val"),
              F.when(t % 3 == 0, F.lit("server"))
              .when(t % 3 == 1, F.lit("client")).otherwise(NS),
              t % 4, F.when(t % 4 == 2, F.lit("boom")).otherwise(F.lit("")))
    s1 = span(1, sid(0),
              F.when(t % 2 == 0,
                     mp("db.system", "mysql", "db.statement", "SELECT 1"))
              .otherwise(mp("db.system", "mysql")),
              F.lit("client"), F.lit(1), F.lit(""))
    s2 = span(2, sid(1), mp("rpc.service", "Echo"), F.lit("internal"),
              F.lit(0), F.lit(""))
    s3 = span(3, F.lit("eeeeeeeeeeeeeeee"),
              F.when(t % 2 == 0, mp("messaging.system", "kafka"))
              .otherwise(mp("faas.trigger", "pubsub")),
              NS, F.lit(2), F.lit(""))
    s4 = span(4, sid(3), F.expr("cast(map() as map<string,string>)"),
              F.lit("producer"),
              F.when(t % 7 == 0, F.lit(-1)).otherwise(F.lit(1)), F.lit(""))
    spans = (b.select(F.md5(F.col("scrape_id")).alias("trace_id"),
                      F.explode(F.array(s0, s1, s2, s3, s4)).alias("s"))
             .select("trace_id", "s.*"))
    conv = convert_spans(spans, resource_tags={"server_name": "srv1"},
                         library_name="lib", library_version="1.0")
    return sentry_transactions(conv)


def _sentry_oracle(d: str) -> str:
    lib = "library_name=lib,library_version=1.0,server_name=srv1"

    def sid(k):
        return f"substr(md5(scrape_id || '#{k}'), 1, 16)"

    def row(k, root_id, role, op, desc, status, tags):
        return (f"SELECT md5(scrape_id) AS trace_id, {sid(k)} AS span_id, "
                f"{root_id} AS root_id, {role} AS role, {op} AS op, "
                f"{desc} AS description, {status} AS status, "
                f"{tags} AS tags_s, "
                f"CAST(t*1000000000 + {k} AS BIGINT) AS start_ns, "
                f"CAST(t*1000000000 + {k} + 1500000000 AS BIGINT) AS end_ns "
                f"FROM base")

    parts = [
        # s0: root unless t%5=0 (then the whole chain orphans)
        row(0, sid(0),
            "CASE WHEN t%5=0 THEN 'orphan' ELSE 'root' END",
            """CASE WHEN t%3=0 THEN 'http.server'
                    WHEN t%3=1 THEN 'http.client' ELSE 'http' END""",
            "'GET nm0_' || CAST(t%3 AS VARCHAR)",
            """CASE WHEN t%4=1 THEN 'ok' ELSE 'unknown' END""",
            f"""'http.method=GET,{lib}'
             || CASE WHEN t%3=0 THEN ',span_kind=server'
                     WHEN t%3=1 THEN ',span_kind=client' ELSE '' END
             || CASE WHEN t%4=2 THEN ',status_message=boom'
                     WHEN t%4=3 THEN ',status_message=error code 3'
                     ELSE '' END"""),
        row(1, f"CASE WHEN t%5=0 THEN {sid(1)} ELSE {sid(0)} END",
            "CASE WHEN t%5=0 THEN 'orphan' ELSE 'child' END",
            "'db'",
            """CASE WHEN t%2=0 THEN 'SELECT 1'
                    ELSE 'nm1_' || CAST(t%3 AS VARCHAR) END""",
            "'ok'",
            f"""CASE WHEN t%2=0 THEN 'db.statement=SELECT 1,' ELSE '' END
             || 'db.system=mysql,{lib},span_kind=client'"""),
        row(2, f"CASE WHEN t%5=0 THEN {sid(2)} ELSE {sid(0)} END",
            "CASE WHEN t%5=0 THEN 'orphan' ELSE 'child' END",
            "'rpc'", "'nm2_' || CAST(t%3 AS VARCHAR)", "'unknown'",
            "'library_name=lib,library_version=1.0,rpc.service=Echo,"
            "server_name=srv1,span_kind=internal'"),
        row(3, sid(3), "'orphan'",
            "CASE WHEN t%2=0 THEN 'message' ELSE 'pubsub' END",
            "'nm3_' || CAST(t%3 AS VARCHAR)", "'unknown'",
            """CASE WHEN t%2=0
               THEN 'library_name=lib,library_version=1.0,"""
            """messaging.system=kafka,server_name=srv1'
               ELSE 'faas.trigger=pubsub,library_name=lib,"""
            """library_version=1.0,server_name=srv1' END"""),
        row(4, sid(4), "'orphan'", "''",
            "'nm4_' || CAST(t%3 AS VARCHAR)",
            "CASE WHEN t%7=0 THEN 'unknown' ELSE 'ok' END",
            f"""'{lib},span_kind=producer'
             || CASE WHEN t%7=0 THEN ',status_message=error code -1'
                     ELSE '' END"""),
    ]
    body = "\nUNION ALL\n".join(parts)
    return f"""WITH {{base}}
{body}"""


def _sentry_oracle_wrap(d: str) -> str:
    return _sentry_oracle(d).replace("{base}", _base_sql(d))




# ---------------------------------------------------------------------------
# alibabacloudlogservice exporter (sinks/alibaba.py)
# ---------------------------------------------------------------------------

def q_alibaba(spark, sf_dir, tok_dir) -> DataFrame:
    """SLS KV flattening battery: NULL bodies dropped, host/service
    pulled (or defaulted) from the resource map, remaining resource
    attrs and record attrs marshaled as sorted-key JSON, flags in hex,
    and the zero-timestamp now() fallback surfacing as NULL time."""
    from .sinks.alibaba import logservice_rows
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    res = F.map_filter(
        F.create_map(
            F.lit("host.name"),
            F.when(t % 4 == 0, F.lit("__absent__"))
            .otherwise(F.concat(F.lit("h"), _s(t % 3))),
            F.lit("service.name"), F.lit("svc"),
            F.lit("region"), F.lit("us"),
            F.lit("zone"), F.concat(F.lit("z"), _s(t % 2))),
        lambda k, v: v != F.lit("__absent__"))
    rows = b.select(
        F.when(t % 11 != 0, F.concat(F.lit("log "), F.col("vs")))
        .alias("body"),
        F.when(t % 6 == 0, F.lit(0)).otherwise(t * 1000000000 + 5)
        .cast("long").alias("ts_ns"),
        (t % 25).cast("int").alias("severity_number"),
        F.lit("INFO").alias("severity_text"),
        F.concat(F.lit("n"), _s(t % 3)).alias("name"),
        (t % 300).cast("int").alias("flags"),
        F.substring(h, 1, 32).alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.create_map(F.lit("zeta"), F.lit("1"),
                     F.lit("alpha"), F.col("vs")).alias("attrs"),
        res.alias("resource"),
        F.lit("lib").alias("lib_name"), F.lit("1.0").alias("lib_version"))
    return logservice_rows(rows)


def _alibaba_oracle(d: str) -> str:
    return f"""WITH {{base}}
SELECT CASE WHEN t%4=0 THEN '' ELSE 'h' || CAST(t%3 AS VARCHAR) END AS host,
       'svc' AS service,
       '{{"region":"us","zone":"z' || CAST(t%2 AS VARCHAR) || '"}}'
           AS resource_json,
       'lib' AS otlp_name, '1.0' AS otlp_version,
       CAST(CASE WHEN t%6=0 THEN 0 ELSE t*1000000000 + 5 END AS VARCHAR)
           AS time_unix_nano,
       CAST(t%25 AS VARCHAR) AS severity_number,
       'INFO' AS severity_text,
       'n' || CAST(t%3 AS VARCHAR) AS name,
       '{{"alpha":"' || vs || '","zeta":"1"}}' AS attribute_json,
       'log ' || vs AS content,
       printf('%x', t%300) AS flags,
       substr(md5(scrape_id), 1, 32) AS trace_id,
       substr(md5(scrape_id), 1, 16) AS span_id,
       CASE WHEN t%6=0 THEN NULL
            ELSE CAST(t + 0 AS BIGINT) END AS time_sec
FROM base WHERE t % 11 <> 0"""


def _alibaba_oracle_wrap(d: str) -> str:
    return _alibaba_oracle(d).replace("{base}", _base_sql(d))




# ---------------------------------------------------------------------------
# honeycomb exporter (sinks/honeycomb.py)
# ---------------------------------------------------------------------------

def q_honeycomb(spark, sf_dir, tok_dir) -> DataFrame:
    """Honeycomb event battery: span events with resource underlay and
    library fields (name dropped when empty), zero-high trace-id
    collapse, duration in float ms, enum-name status fallback with
    decimal out-of-range rendering, int64-typed sample-rate rule, plus
    span_event and link annotations."""
    from .sinks.honeycomb import honeycomb_events
    b = _base(spark, tok_dir).cache()
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    zeros = F.lit("0" * 16)
    trace_id = (F.when(t % 2 == 0, F.concat(zeros, F.substring(h, 1, 16)))
                .otherwise(F.md5(F.concat(F.col("scrape_id"), F.lit("T")))))
    resource = F.create_map(F.lit("aa"), F.lit("res-a"),
                            F.lit("rr"), F.concat(F.lit("r"), _s(t % 2)))
    kinds = ["client", "server", "producer", "consumer", "internal",
             "unspecified", "weird"]
    spans = b.select(
        trace_id.alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.when(t % 3 != 0, F.substring(h, 17, 16)).alias("parent_span_id"),
        F.concat(F.lit("sp"), _s(t % 3)).alias("name"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]),
                     (t % 7 + 1).cast("int")).alias("kind"),
        (t * 1000000000).cast("long").alias("start_ns"),
        (t * 1000000000 + 1500000000 + (t % 50) * 1000).cast("long")
        .alias("end_ns"),
        (t % 5).cast("int").alias("status_code"),
        F.when(t % 4 == 0, F.lit("m")).otherwise(F.lit(""))
        .alias("status_message"),
        F.create_map(F.lit("aa"), F.col("vs")).alias("attrs"),
        F.create_map(F.lit("rate"), (t % 16).cast("long"),
                     F.lit("n"), (t % 9).cast("long")).alias("attrs_int"),
        resource.alias("resource"),
        F.when(t % 6 == 0, F.lit("")).otherwise(F.lit("lib"))
        .alias("lib_name"),
        F.lit("1").alias("lib_version"))
    events = (b.filter(t % 3 != 1).select(
        trace_id.alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.concat(F.lit("sp"), _s(t % 3)).alias("span_name"),
        F.concat(F.lit("ev"), _s(t % 2)).alias("event_name"),
        (t * 1000000000 + 7).cast("long").alias("ts_ns"),
        F.create_map(F.lit("ek"), F.concat(F.lit("v"), _s(t % 3)))
        .alias("attrs"),
        F.expr("cast(map() as map<string,bigint>)").alias("attrs_int"),
        resource.alias("resource")))
    links = (b.filter(t % 4 == 0).select(
        trace_id.alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.concat(zeros, F.substring(F.md5(F.concat(F.col("scrape_id"),
                                                   F.lit("L"))), 17, 16))
        .alias("link_trace_id"),
        F.substring(F.md5(F.concat(F.col("scrape_id"), F.lit("L"))), 1, 16)
        .alias("link_span_id"),
        F.create_map(F.lit("lk"), F.lit("1")).alias("attrs"),
        F.create_map(F.lit("rate"), F.lit(7).cast("long"))
        .alias("attrs_int")))
    return honeycomb_events(spans, events, links,
                            sample_rate_attribute="rate")


def _honeycomb_oracle(d: str) -> str:
    nul = "CAST(NULL AS VARCHAR)"
    hcid = ("CASE WHEN t%2=0 THEN substr(md5(scrape_id), 1, 16) "
            "ELSE md5(scrape_id || 'T') END")
    status_msg = """CASE WHEN t%4=0 THEN 'm'
       WHEN t%5=0 THEN 'STATUS_CODE_UNSET'
       WHEN t%5=1 THEN 'STATUS_CODE_OK'
       WHEN t%5=2 THEN 'STATUS_CODE_ERROR'
       ELSE CAST(t%5 AS VARCHAR) END"""
    kinds = ("CASE t%7 WHEN 0 THEN 'client' WHEN 1 THEN 'server' "
             "WHEN 2 THEN 'producer' WHEN 3 THEN 'consumer' "
             "WHEN 4 THEN 'internal' ELSE 'unspecified' END")
    span_fields = ("'aa=' || vs || "
                   "CASE WHEN t%6=0 THEN '' ELSE ',library.name=lib' END"
                   " || ',library.version=1,n=' || CAST(t%9 AS VARCHAR)"
                   " || ',rate=' || CAST(t%16 AS VARCHAR)"
                   " || ',rr=r' || CAST(t%2 AS VARCHAR)")
    return f"""WITH {{base}}
SELECT {nul} AS annotation_type, {hcid} AS trace_id,
       substr(md5(scrape_id), 1, 16) AS span_id,
       CASE WHEN t%3<>0 THEN substr(md5(scrape_id), 17, 16) END
           AS parent_id,
       'sp' || CAST(t%3 AS VARCHAR) AS name, {nul} AS parent_name,
       {nul} AS link_trace_id, {nul} AS link_span_id,
       CAST(1500000000 + (t%50)*1000 AS DOUBLE) / 1000000.0
           AS duration_ms,
       CAST(t*1000000000 AS BIGINT) AS ts_ns,
       {kinds} AS span_kind,
       CAST(t%5 AS INT) AS status_code,
       {status_msg} AS status_message,
       CAST(t%16 AS BIGINT) AS sample_rate,
       {span_fields} AS fields_s
FROM base
UNION ALL
SELECT 'span_event', {hcid}, {nul},
       substr(md5(scrape_id), 1, 16),
       'ev' || CAST(t%2 AS VARCHAR), 'sp' || CAST(t%3 AS VARCHAR),
       {nul}, {nul}, CAST(NULL AS DOUBLE),
       CAST(t*1000000000 + 7 AS BIGINT), {nul}, CAST(NULL AS INT), {nul},
       CAST(NULL AS BIGINT),
       'aa=res-a,ek=v' || CAST(t%3 AS VARCHAR)
           || ',rr=r' || CAST(t%2 AS VARCHAR)
FROM base WHERE t%3 <> 1
UNION ALL
SELECT 'link', {hcid}, {nul},
       substr(md5(scrape_id), 1, 16),
       {nul}, {nul},
       substr(md5(scrape_id || 'L'), 17, 16),
       substr(md5(scrape_id || 'L'), 1, 16),
       CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT), {nul},
       CAST(NULL AS INT), {nul},
       CAST(7 AS BIGINT), 'lk=1,rate=7'
FROM base WHERE t%4 = 0"""


def _honeycomb_oracle_wrap(d: str) -> str:
    return _honeycomb_oracle(d).replace("{base}", _base_sql(d))




# ---------------------------------------------------------------------------
# newrelic exporter (sinks/newrelic.py)
# ---------------------------------------------------------------------------

def q_newrelic(spark, sf_dir, tok_dir) -> DataFrame:
    """New Relic span battery: invalid-id drops, Unset-code absence,
    OK/ERROR/decimal status rendering, desc-needs-code-and-message,
    conditional instrumentation fields, span-attr overlay, and the
    collector.name/version final override (even over a spoofed span
    attr)."""
    from .sinks.newrelic import newrelic_spans
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    kinds = ["client", "server", "producer", "consumer", "internal",
             "unspecified"]
    spans = b.select(
        F.when(t % 13 != 0,
               F.md5(F.concat(F.col("scrape_id"), F.lit("T"))))
        .otherwise(F.lit("")).alias("trace_id"),
        F.when(t % 17 != 0, F.substring(h, 1, 16))
        .otherwise(F.lit("")).alias("span_id"),
        F.when(t % 3 != 0, F.substring(h, 17, 16)).alias("parent_span_id"),
        F.concat(F.lit("sp"), _s(t % 3)).alias("name"),
        F.element_at(F.array(*[F.lit(k) for k in kinds]),
                     (t % 6 + 1).cast("int")).alias("kind"),
        (t * 1000000000).cast("long").alias("start_ns"),
        (t * 1000000000 + 2000000 + t % 9).cast("long").alias("end_ns"),
        (t % 4).cast("int").alias("status_code"),
        F.when(t % 5 == 0, F.lit("boom")).otherwise(F.lit(""))
        .alias("status_message"),
        F.create_map(F.lit("aa"), F.col("vs"),
                     F.lit("collector.name"), F.lit("spoof")).alias("attrs"),
        F.create_map(F.lit("aa"), F.lit("res"),
                     F.lit("service.name"), F.lit("svc")).alias("resource"),
        F.when(t % 6 == 0, F.lit("")).otherwise(F.lit("lib"))
        .alias("lib_name"),
        F.when(t % 8 == 0, F.lit("")).otherwise(F.lit("1.0"))
        .alias("lib_version"),
        (t % 4).cast("int").alias("n_events"))
    return newrelic_spans(spans)


def _newrelic_oracle(d: str) -> str:
    attrs = """'aa=' || vs
 || ',collector.name=opentelemetry-collector,collector.version=0.0.0'
 || CASE WHEN t%6=0 THEN ''
         ELSE ',instrumentation.name=lib'
              || CASE WHEN t%8=0 THEN ''
                      ELSE ',instrumentation.version=1.0' END END
 || CASE WHEN t%4=0 THEN ''
         ELSE ',otel.status_code='
              || CASE t%4 WHEN 1 THEN 'OK' WHEN 2 THEN 'ERROR'
                          ELSE '3' END END
 || CASE WHEN t%4<>0 AND t%5=0 THEN ',otel.status_description=boom'
         ELSE '' END
 || ',service.name=svc'
 || CASE t%6 WHEN 0 THEN ',span.kind=client' WHEN 1 THEN ',span.kind=server'
             WHEN 2 THEN ',span.kind=producer'
             WHEN 3 THEN ',span.kind=consumer'
             WHEN 4 THEN ',span.kind=internal' ELSE '' END"""
    return f"""WITH {{base}}
SELECT md5(scrape_id || 'T') AS trace_id,
       substr(md5(scrape_id), 1, 16) AS span_id,
       CASE WHEN t%3<>0 THEN substr(md5(scrape_id), 17, 16)
            ELSE '' END AS parent_id,
       'sp' || CAST(t%3 AS VARCHAR) AS name,
       CAST(t*1000000000 AS BIGINT) AS ts_ns,
       CAST(2000000 + t%9 AS BIGINT) AS duration_ns,
       CAST(t%4 AS INT) AS n_events,
       {attrs} AS attrs_s
FROM base WHERE t%13 <> 0 AND t%17 <> 0"""


def _newrelic_oracle_wrap(d: str) -> str:
    return _newrelic_oracle(d).replace("{base}", _base_sql(d))




# ---------------------------------------------------------------------------
# elastic exporter exceptions (operators/elastic.py)
# ---------------------------------------------------------------------------

def q_elastic(spark, sf_dir, tok_dir) -> DataFrame:
    """Elastic APM exception battery over synthesized Java stacktraces:
    a simple trace, a Caused-by chain with a '... 1 more' frame copy,
    a malformed trace (raw-attribute fallback), and a non-java
    language fallback; empty messages render [EMPTY]."""
    from .operators.elastic import exception_errors
    b = _base(spark, tok_dir)
    t = F.col("t")
    line_no = (10 + t % 5).cast("string")
    v0 = F.concat(
        F.lit("java.lang.RuntimeException: x\n"
              "\tat com.example/app.Main.run(Main.java:"),
        line_no, F.lit(")\n\tat app.Util.call(Util.java)\n"))
    v1 = F.concat(
        v0, F.lit("Caused by: java.io.IOException: io"), _s(t % 4),
        F.lit("\n\tat app.IO.read(IO.java:7)\n\t... 1 more\n"))
    v2 = F.lit("Exception\n\tgarbage line\n")
    st = (F.when(t % 3 == 0, v0).when(t % 3 == 1, v1).otherwise(v2))
    rows = b.select(
        (t * 1000000000).cast("long").alias("ts_ns"),
        F.md5(F.concat(F.col("scrape_id"), F.lit("T"))).alias("trace_id"),
        F.substring(F.md5(F.col("scrape_id")), 1, 16).alias("span_id"),
        F.concat(F.lit("T"), _s(t % 3)).alias("exc_type"),
        F.when(t % 6 == 0, F.lit("")).otherwise(F.lit("m")).alias("exc_message"),
        st.alias("exc_stacktrace"),
        (t % 2 == 0).alias("exc_escaped"),
        F.when(t % 9 == 0, F.lit("go")).otherwise(F.lit("java"))
        .alias("language"))
    return exception_errors(rows)


def _elastic_oracle(d: str) -> str:
    line_no = "CAST(10 + t%5 AS VARCHAR)"
    v0 = ("'java.lang.RuntimeException: x' || chr(10) "
          "|| chr(9) || 'at com.example/app.Main.run(Main.java:' || "
          + line_no +
          " || ')' || chr(10) || chr(9) || 'at app.Util.call(Util.java)'"
          " || chr(10)")
    v1 = (v0 + " || 'Caused by: java.io.IOException: io' "
          "|| CAST(t%4 AS VARCHAR) || chr(10) "
          "|| chr(9) || 'at app.IO.read(IO.java:7)' || chr(10) "
          "|| chr(9) || '... 1 more' || chr(10)")
    v2 = "'Exception' || chr(10) || chr(9) || 'garbage line' || chr(10)"
    raw = (f"CASE WHEN t%3=0 THEN {v0} WHEN t%3=1 THEN {v1} "
           f"ELSE {v2} END")
    frames0 = ("'com.example|app.Main|run|Main.java|' || " + line_no +
               " || ';|app.Util|call|Util.java|0'")
    frames1 = ("'|app.IO|read|IO.java|7;|app.Util|call|Util.java|0'")
    msg0 = "CASE WHEN t%6=0 THEN '[EMPTY]' ELSE 'm' END"
    NUL = "CAST(NULL AS VARCHAR)"
    common = ("CAST(t*1000000000 AS BIGINT) AS ts_ns, "
              "md5(scrape_id || 'T') AS trace_id, "
              "substr(md5(scrape_id), 1, 16) AS span_id")
    return f"""WITH {{base}}
-- parsed outer rows (java, variants 0 and 1)
SELECT {common}, 0 AS depth, 'T' || CAST(t%3 AS VARCHAR) AS type,
       {msg0} AS message, (t%2 <> 0) AS handled,
       CAST(2 AS INT) AS n_frames, {frames0} AS frames_s,
       {NUL} AS raw_stacktrace
FROM base WHERE t%9 <> 0 AND t%3 IN (0, 1)
UNION ALL
-- cause rows (variant 1)
SELECT {common}, 1, {NUL},
       'java.io.IOException: io' || CAST(t%4 AS VARCHAR), (t%2 <> 0),
       CAST(2 AS INT), {frames1}, {NUL}
FROM base WHERE t%9 <> 0 AND t%3 = 1
UNION ALL
-- fallbacks: malformed (variant 2) or non-java language
SELECT {common}, 0, 'T' || CAST(t%3 AS VARCHAR), {msg0}, (t%2 <> 0),
       CAST(NULL AS INT), {NUL}, {raw}
FROM base WHERE t%9 = 0 OR t%3 = 2"""


def _elastic_oracle_wrap(d: str) -> str:
    return _elastic_oracle(d).replace("{base}", _base_sql(d))




# ---------------------------------------------------------------------------
# elastic exporter spans/transactions (operators/elastic.py)
# ---------------------------------------------------------------------------

def q_elastic_spans(spark, sf_dir, tok_dir) -> DataFrame:
    """Elastic APM span/transaction battery: nine variants cycling
    through root/server transactions (absolute URL, target+host
    composition, net.* fallbacks, the no-request 'unknown' type) and
    client spans (implicit/explicit default-port destination rules,
    peer-composed URL hosts, db destination overwrite, bare app
    spans)."""
    from .operators.elastic import elastic_spans
    b = _base(spark, tok_dir)
    t = F.col("t")
    h = F.md5(F.col("scrape_id"))
    v = (t % 9).cast("int")
    NS = F.lit(None).cast("string")
    NL = F.lit(None).cast("long")
    NI = F.lit(None).cast("int")
    port0 = (8000 + t % 100).cast("string")

    def when_v(n, col, els):
        return F.when(v == n, col).otherwise(els)

    rows = b.select(
        F.lit("T").alias("trace_id"),
        F.substring(h, 1, 16).alias("span_id"),
        F.when(~v.isin(0, 2, 3), F.substring(h, 17, 16))
        .alias("parent_span_id"),
        F.concat(F.lit("nm"), _s(t % 3)).alias("name"),
        F.when(v == 1, F.lit("server")).when(v == 2, F.lit("internal"))
        .otherwise(F.lit("client")).alias("kind"),
        (t * 1000000000).cast("long").alias("start_ns"),
        (t * 1000000000 + 2000000 + (t % 5) * 1000).cast("long")
        .alias("end_ns"),
        (t % 3).cast("int").alias("status_code"),
        F.when(v == 0, F.lit("GET")).when(v == 2, F.lit("POST"))
        .alias("http_method"),
        F.when(v == 0, F.concat(F.lit("https://ex.com:"), port0,
                                F.lit("/a/b?q="), _s(t % 3)))
        .when(v == 4, F.concat(F.lit("http://svc"), _s(t % 4),
                               F.lit(".io/api?z=3")))
        .when(v == 5, F.concat(F.lit("https://svc"), _s(t % 4),
                               F.lit(".io:443/x")))
        .alias("http_url"),
        F.when(v == 1, F.concat(F.lit("/p"), _s(t % 4), F.lit("?x=2")))
        .when(v == 6, F.lit("/only")).alias("http_target"),
        F.when(v == 1, F.concat(F.lit("h"), _s(t % 2), F.lit(".com:8080")))
        .alias("http_host"),
        F.when(v.isin(1, 6), F.lit("http")).alias("http_scheme"),
        F.when(v == 0, 200 + t % 100).cast("long").alias("http_status_code"),
        F.when(v == 0, F.lit("1.1")).alias("http_flavor"),
        NS.alias("http_server_name"),
        F.when(v == 6, F.concat(F.lit("np"), _s(t % 3)))
        .alias("net_peer_name"),
        F.when(v == 2, F.concat(F.lit("9.9.9."), _s(t % 250)))
        .when(v == 7, F.lit("1.2.3.4")).alias("net_peer_ip"),
        F.when(v == 2, (t % 5).cast("int"))
        .when(v == 6, F.lit(9000)).cast("int").alias("net_peer_port"),
        F.when(v == 2, F.concat(F.lit("nh"), _s(t % 3)))
        .alias("net_host_name"),
        F.when(v == 2, (8000 + t % 7).cast("int")).cast("int")
        .alias("net_host_port"),
        F.when(v == 7, F.when(t % 2 == 0, F.lit("mysql"))
               .otherwise(F.lit("pg"))).alias("db_system"),
        F.when(v == 7, F.lit("d1")).alias("db_name"),
        NS.alias("db_statement"), NS.alias("db_user"))
    return elastic_spans(rows)


def _elastic_spans_oracle(d: str) -> str:
    NS = "CAST(NULL AS VARCHAR)"
    NI = "CAST(NULL AS INT)"
    dur = "CAST(2000000 + (t%5)*1000 AS DOUBLE) / 1000000.0"
    outc = ("CASE t%3 WHEN 1 THEN 'success' WHEN 2 THEN 'failure' "
            "ELSE '' END")
    res = "CASE t%3 WHEN 1 THEN 'OK' WHEN 2 THEN 'Error' ELSE NULL END"
    cols = ("kind_row, trace_id, span_id, parent_id, name, ts_ns, "
            "duration_ms, outcome, result, tx_type, url_protocol, "
            "url_hostname, url_port, url_path, url_search, status_code, "
            "http_version, remote_addr, span_type, span_subtype, "
            "dest_addr, dest_port, dest_service_name, "
            "dest_service_resource")

    def row(v, kind_row, parent, body, where=""):
        return (f"SELECT '{kind_row}' AS kind_row, 'T' AS trace_id, "
                f"substr(md5(scrape_id),1,16) AS span_id, {parent} AS "
                f"parent_id, 'nm' || CAST(t%3 AS VARCHAR) AS name, "
                f"CAST(t*1000000000 AS BIGINT) AS ts_ns, {dur} AS "
                f"duration_ms, {outc} AS outcome, {body} "
                f"FROM base WHERE t%9 = {v}{where}")

    par = "substr(md5(scrape_id),17,16)"
    tx_tail = ("{res} AS result, '{ttype}' AS tx_type, {proto} AS "
               "url_protocol, {host} AS url_hostname, {port} AS url_port, "
               "{path} AS url_path, {search} AS url_search, {sc} AS "
               "status_code, {flavor} AS http_version, {remote} AS "
               "remote_addr, " + NS + " AS span_type, " + NS +
               " AS span_subtype, " + NS + " AS dest_addr, " + NI +
               " AS dest_port, " + NS + " AS dest_service_name, " + NS +
               " AS dest_service_resource")
    sp_tail = (f"{NS} AS result, {NS} AS tx_type, {NS} AS url_protocol, "
               f"{NS} AS url_hostname, {NS} AS url_port, {NS} AS url_path, "
               f"{NS} AS url_search, {NI} AS status_code, {NS} AS "
               "http_version, " + NS + " AS remote_addr, '{stype}' AS "
               "span_type, {sub} AS span_subtype, {addr} AS dest_addr, "
               "{dport} AS dest_port, {sname} AS dest_service_name, "
               "{sres} AS dest_service_resource")

    parts = [
        row(0, "transaction", "''", tx_tail.format(
            res=res, ttype="request", proto="'https'",
            host="'ex.com'", port="CAST(8000 + t%100 AS VARCHAR)",
            path="'/a/b'", search="'q=' || CAST(t%3 AS VARCHAR)",
            sc="CAST(200 + t%100 AS INT)", flavor="'1.1'", remote=NS)),
        row(1, "transaction", par, tx_tail.format(
            res=res, ttype="request", proto="'http'",
            host="'h' || CAST(t%2 AS VARCHAR) || '.com'", port="'8080'",
            path="'/p' || CAST(t%4 AS VARCHAR)", search="'x=2'",
            sc=NI, flavor=NS, remote=NS)),
        row(2, "transaction", "''", tx_tail.format(
            res=res, ttype="request", proto="'http'",
            host="'nh' || CAST(t%3 AS VARCHAR)",
            port="CAST(8000 + t%7 AS VARCHAR)", path=NS, search=NS,
            sc=NI, flavor=NS,
            remote=("'9.9.9.' || CAST(t%250 AS VARCHAR) || "
                    "CASE WHEN t%5 > 0 THEN ':' || CAST(t%5 AS VARCHAR) "
                    "ELSE '' END"))),
        row(3, "transaction", "''", tx_tail.format(
            res=res, ttype="unknown", proto=NS, host=NS, port=NS,
            path=NS, search=NS, sc=NI, flavor=NS, remote=NS)),
        row(4, "span", par, sp_tail.format(
            stype="external", sub="'http'",
            addr="'svc' || CAST(t%4 AS VARCHAR) || '.io'", dport="80",
            sname="'http://svc' || CAST(t%4 AS VARCHAR) || '.io'",
            sres="'svc' || CAST(t%4 AS VARCHAR) || '.io:80'")),
        row(5, "span", par, sp_tail.format(
            stype="external", sub="'http'",
            addr="'svc' || CAST(t%4 AS VARCHAR) || '.io'", dport="443",
            sname="'https://svc' || CAST(t%4 AS VARCHAR) || '.io'",
            sres="'svc' || CAST(t%4 AS VARCHAR) || '.io:443'")),
        row(6, "span", par, sp_tail.format(
            stype="external", sub="'http'",
            addr="'np' || CAST(t%3 AS VARCHAR)", dport="9000",
            sname="'http://np' || CAST(t%3 AS VARCHAR) || ':9000'",
            sres="'np' || CAST(t%3 AS VARCHAR) || ':9000'")),
        row(7, "span", par, sp_tail.format(
            stype="db",
            sub="CASE WHEN t%2=0 THEN 'mysql' ELSE 'pg' END",
            addr="'1.2.3.4'", dport="0",
            sname="CASE WHEN t%2=0 THEN 'mysql' ELSE 'pg' END",
            sres="CASE WHEN t%2=0 THEN 'mysql' ELSE 'pg' END")),
        row(8, "span", par, sp_tail.format(
            stype="app", sub=NS, addr=NS, dport=NI, sname=NS, sres=NS)),
    ]
    body = "\nUNION ALL\n".join(parts)
    return f"""WITH {{base}}
{body}"""


def _elastic_spans_oracle_wrap(d: str) -> str:
    return _elastic_spans_oracle(d).replace("{base}", _base_sql(d))



# ---------------------------------------------------------------------------
# windowsperfcounters (scraper.go:86-150, pdh.go:87-106)
# ---------------------------------------------------------------------------

def q_winperf(spark, sf_dir, tok_dir) -> DataFrame:
    """PDH readings -> DoubleGauges: a wildcard Processor counter whose
    expansion always includes a ``_Total`` rollup (dropped — multiple
    values), a single-value ``_Total`` LogicalDisk counter (instance
    cleared) and an instance-less Memory counter."""
    from .operators.winperf import winperf_gauges
    b = _base(spark, tok_dir)
    t = F.col("t")
    proc = (b.select(
        "scrape_id", t.alias("t"),
        F.explode(F.sequence(F.lit(0), (t % 3).cast("int"))).alias("i"))
        .select("scrape_id", F.lit("Processor").alias("object"),
                F.lit("*").alias("instance_cfg"),
                F.lit("% Processor Time").alias("counter"),
                F.col("i").cast("string").alias("instance_name"),
                ((F.col("t") % 100) + F.col("i")).cast("double")
                .alias("value")))
    proc_total = b.select(
        "scrape_id", F.lit("Processor").alias("object"),
        F.lit("*").alias("instance_cfg"),
        F.lit("% Processor Time").alias("counter"),
        F.lit("_Total").alias("instance_name"),
        ((t % 100) + F.lit(50)).cast("double").alias("value"))
    disk = b.select(
        "scrape_id", F.lit("LogicalDisk").alias("object"),
        F.lit("_Total").alias("instance_cfg"),
        F.lit("% Free Space").alias("counter"),
        F.lit("_Total").alias("instance_name"),
        (t % 55).cast("double").alias("value"))
    mem = b.select(
        "scrape_id", F.lit("Memory").alias("object"),
        F.lit("").alias("instance_cfg"),
        F.lit("Committed Bytes").alias("counter"),
        F.lit("").alias("instance_name"),
        (t % 1000).cast("double").alias("value"))
    scraped = (proc.unionByName(proc_total).unionByName(disk)
               .unionByName(mem))
    return winperf_gauges(scraped)


def _winperf_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
       '\\Processor(*)\\% Processor Time' AS metric_name,
       CAST(u.i AS VARCHAR) AS instance,
       CAST(t % 100 + u.i AS DOUBLE) AS value
FROM base, UNNEST(range(0, t % 3 + 1)) AS u(i)
UNION ALL
SELECT scrape_id, '\\LogicalDisk(_Total)\\% Free Space',
       CAST(NULL AS VARCHAR), CAST(t % 55 AS DOUBLE) FROM base
UNION ALL
SELECT scrape_id, '\\Memory\\Committed Bytes',
       CAST(NULL AS VARCHAR), CAST(t % 1000 AS DOUBLE) FROM base"""


# ---------------------------------------------------------------------------
# signalfx receiver-side translation (signalfxv2_to_metricdata.go,
# signalfxv2_event_to_logdata.go)
# ---------------------------------------------------------------------------

def q_sfx_receive(spark, sf_dir, tok_dir) -> DataFrame:
    """SFx v2 datapoints -> metrics: the 6 synth arms exercise the full
    type matrix plus the nil-datum drop (t%6=4) and the unknown-type
    drop (t%6=5, datum present but type ENUM)."""
    from .operators.sfx_receive import sfx_datapoints_to_metrics
    b = _base(spark, tok_dir)
    t = F.col("t")
    m = t % 6
    dps = b.select(
        F.col("scrape_id").alias("dp_id"),
        F.concat(F.lit("metric."), (t % 7).cast("string")).alias("metric"),
        (F.when(m == 5, F.lit("ENUM"))
         .when((m == 0) | (m == 1), F.lit("GAUGE"))
         .when(m == 2, F.lit("COUNTER"))
         .otherwise(F.lit("CUMULATIVE_COUNTER"))).alias("metric_type"),
        F.when((m == 1) | (m == 2) | (m == 5), t % 97).cast("long")
        .alias("int_value"),
        F.when((m == 0) | (m == 3), (t % 89) / F.lit(7.0))
        .alias("double_value"),
        (t * 1000).alias("timestamp_ms"),
        F.create_map(F.lit("host"),
                     F.concat(F.lit("h"), (t % 4).cast("string")))
        .alias("dimensions"))
    out = sfx_datapoints_to_metrics(dps)
    return out.select(
        "dp_id", "name", "data_type", "temporality", "monotonic",
        "ts_ns", "value_i", "value_d",
        F.col("dimensions")["host"].alias("host"))


def _sfx_receive_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id AS dp_id,
       'metric.' || CAST(t % 7 AS VARCHAR) AS name,
       CASE WHEN t % 6 = 0 THEN 'DoubleGauge'
            WHEN t % 6 = 1 THEN 'IntGauge'
            WHEN t % 6 = 2 THEN 'IntSum'
            ELSE 'DoubleSum' END AS data_type,
       CASE WHEN t % 6 = 2 THEN 'delta'
            WHEN t % 6 = 3 THEN 'cumulative'
            ELSE NULL END AS temporality,
       CASE WHEN t % 6 IN (2, 3) THEN TRUE ELSE NULL END AS monotonic,
       t * 1000 * 1000000 AS ts_ns,
       CASE WHEN t % 6 IN (1, 2) THEN t % 97 ELSE NULL END AS value_i,
       CASE WHEN t % 6 IN (0, 3) THEN (t % 89) / 7.0
            ELSE NULL END AS value_d,
       'h' || CAST(t % 4 AS VARCHAR) AS host
FROM base WHERE t % 6 IN (0, 1, 2, 3)"""


def q_sfx_events(spark, sf_dir, tok_dir) -> DataFrame:
    """SFx v2 events -> logs: typed-property rendering (str/double/bool
    precedence on key 's', always-int 'i', always-null 'n'), ms -> ns,
    and the explicit-null category marker."""
    from .operators.sfx_receive import sfx_events_to_logs
    b = _base(spark, tok_dir)
    t = F.col("t")
    snull = F.lit(None).cast("string")
    lnull = F.lit(None).cast("long")
    dnull = F.lit(None).cast("double")
    bnull = F.lit(None).cast("boolean")

    def pstruct(s, i, dd, bb):
        return F.struct(s.alias("str_v"), i.alias("int_v"),
                        dd.alias("double_v"), bb.alias("bool_v"))

    props = F.create_map(
        F.lit("i"), pstruct(snull, (t % 7).cast("long"), dnull, bnull),
        F.lit("s"), pstruct(
            F.when(t % 3 == 0,
                   F.concat(F.lit("x"), (t % 5).cast("string"))),
            lnull,
            F.when(t % 3 == 1, (t % 11) / F.lit(2.0)),
            F.when(t % 3 == 2, (t % 2 == 0))),
        F.lit("n"), pstruct(snull, lnull, dnull, bnull))
    events = b.select(
        F.col("scrape_id").alias("event_id"),
        F.concat(F.lit("ev"), (t % 3).cast("string")).alias("event_type"),
        (t * 1000).alias("timestamp_ms"),
        F.when(t % 2 == 0, t % 1000).cast("long").alias("category"),
        F.create_map(F.lit("env"),
                     F.concat(F.lit("e"), (t % 3).cast("string")))
        .alias("dimensions"),
        props.alias("properties"))
    out = sfx_events_to_logs(events)
    return out.select(
        "event_id", "name", "ts_ns", "category",
        F.col("properties_typed")["i"].alias("p_i"),
        F.col("properties_typed")["s"].alias("p_s"),
        F.col("properties_typed")["n"].alias("p_n"),
        F.col("dimensions")["env"].alias("env"))


def _sfx_events_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id AS event_id,
       'ev' || CAST(t % 3 AS VARCHAR) AS name,
       t * 1000 * 1000000 AS ts_ns,
       CASE WHEN t % 2 = 0 THEN t % 1000 ELSE NULL END AS category,
       'i:' || CAST(t % 7 AS VARCHAR) AS p_i,
       CASE WHEN t % 3 = 0 THEN 's:x' || CAST(t % 5 AS VARCHAR)
            WHEN t % 3 = 1 THEN 'd:' || CAST((t % 11) / 2.0 AS VARCHAR)
            ELSE 'b:' || CASE WHEN t % 2 = 0 THEN 'true' ELSE 'false' END
       END AS p_s,
       'null' AS p_n,
       'e' || CAST(t % 3 AS VARCHAR) AS env
FROM base"""


# ---------------------------------------------------------------------------
# prometheus_exec (receiver.go:99-153, 283-295)
# ---------------------------------------------------------------------------

def q_promexec(spark, sf_dir, tok_dir) -> DataFrame:
    """Receiver-fleet config derivation: custom-name extraction
    (incl. the empty-suffix fallback and SplitN keep-rest), {{port}}
    templating, and the static localhost target."""
    from .operators.promexec import (extract_name_column,
                                     fill_port_placeholders_column)
    b = _base(spark, tok_dir)
    t = F.col("t")
    name = F.concat(
        F.lit("prometheus_exec/"),
        F.when(t % 3 == 0, F.lit("postgres"))
        .when(t % 3 == 1, F.lit(""))
        .otherwise(F.lit("a/b")))
    port = (F.lit(9000) + t % 1000).cast("int")
    cmd = F.lit("exporter --web.listen-address=:{{port}} --x={{port}}")
    df = b.select("scrape_id", name.alias("receiver_name"),
                  port.alias("port"), cmd.alias("command"))
    return df.select(
        "scrape_id",
        extract_name_column(F.col("receiver_name")).alias("job_name"),
        fill_port_placeholders_column(F.col("command"), F.col("port"))
        .alias("command_filled"),
        F.concat(F.lit("localhost:"), F.col("port").cast("string"))
        .alias("target"))


def _promexec_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
       CASE WHEN t % 3 = 0 THEN 'postgres'
            WHEN t % 3 = 1 THEN 'prometheus_exec'
            ELSE 'a/b' END AS job_name,
       replace('exporter --web.listen-address=:{{{{port}}}} --x={{{{port}}}}',
               '{{{{port}}}}', CAST(9000 + t % 1000 AS VARCHAR))
           AS command_filled,
       'localhost:' || CAST(9000 + t % 1000 AS VARCHAR) AS target
FROM base"""


# ---------------------------------------------------------------------------
# jmx gatherer properties (receiver.go:132-175)
# ---------------------------------------------------------------------------

def q_jmx_props(spark, sf_dir, tok_dir) -> DataFrame:
    """Per-endpoint gatherer properties: endpoint coercion to the RMI
    service URL, target-system-over-groovy precedence, conditional
    credential lines, fixed field order."""
    from .operators.jmx import jmx_gatherer_properties_column
    b = _base(spark, tok_dir)
    t = F.col("t")
    endpoint = F.concat(F.lit("host"), (t % 50).cast("string"),
                        F.lit(":"), (F.lit(7000) + t % 100).cast("string"))
    target = (F.when(t % 3 == 0, F.lit("jvm")).otherwise(F.lit("")))
    groovy = (F.when(t % 3 == 1, F.lit("script.groovy"))
              .otherwise(F.lit("")))
    user = F.when(t % 5 == 0, F.lit("admin")).otherwise(F.lit(""))
    pw = F.when(t % 7 == 0, F.lit("secret")).otherwise(F.lit(""))
    return b.select(
        "scrape_id",
        jmx_gatherer_properties_column(
            endpoint, F.lit(10000) + t % 7, F.lit("0.0.0.0:4317"),
            F.lit(5000), target, groovy, user, pw).alias("props"))


def _jmx_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
       'otel.jmx.service.url = service:jmx:rmi:///jndi/rmi://host'
       || CAST(t % 50 AS VARCHAR) || ':'
       || CAST(7000 + t % 100 AS VARCHAR) || '/jmxrmi'
       || chr(10)
       || 'otel.jmx.interval.milliseconds = '
       || CAST(10000 + t % 7 AS VARCHAR) || chr(10)
       || CASE WHEN t % 3 = 0 THEN 'otel.jmx.target.system = jvm'
               || chr(10)
               WHEN t % 3 = 1 THEN 'otel.jmx.groovy.script = script.groovy'
               || chr(10)
               ELSE '' END
       || 'otel.exporter = otlp' || chr(10)
       || 'otel.exporter.otlp.endpoint = 0.0.0.0:4317' || chr(10)
       || 'otel.exporter.otlp.metric.timeout = 5000' || chr(10)
       || CASE WHEN t % 5 = 0 THEN 'otel.jmx.username = admin' || chr(10)
               ELSE '' END
       || CASE WHEN t % 7 = 0 THEN 'otel.jmx.password = secret' || chr(10)
               ELSE '' END AS props
FROM base"""


def q_syslog(spark, sf_dir, tok_dir) -> DataFrame:
    """Syslog parse battery (operators/syslog.py): RFC 5424 and RFC
    3164 lines synthesized per distinct carbon epoch ``t`` — pri edge
    values, nil procid/SD, tag-without-pid — and parsed with the real
    sniffing parser.  The oracle derives every expected field from
    ``t`` arithmetic; it never re-parses the line."""
    from .operators.syslog import parse_syslog
    b = _base(spark, tok_dir)
    t = F.col("t")
    pri = _s(t % 192)
    ts5424 = F.concat(F.date_format(F.timestamp_seconds(t),
                                    "yyyy-MM-dd'T'HH:mm:ss"), F.lit("Z"))
    ts3164 = F.concat_ws(
        " ", F.date_format(F.timestamp_seconds(t), "MMM"),
        F.date_format(F.timestamp_seconds(t), "d"),
        F.date_format(F.timestamp_seconds(t), "HH:mm:ss"))
    sd = F.when(t % 3 == 0, F.lit("-")).otherwise(
        F.concat(F.lit('[ex@1 k="v'), _s(t % 9), F.lit('" n="'),
                 _s(t % 11), F.lit('"]')))
    line5424 = F.concat(
        F.lit("<"), pri, F.lit(">1 "), ts5424,
        F.lit(" h"), _s(t % 5), F.lit(" app"), _s(t % 3), F.lit(" "),
        F.when(t % 4 == 0, F.lit("-")).otherwise(_s(t % 1000)),
        F.lit(" ID"), _s(t % 7), F.lit(" "), sd,
        F.lit(" took "), F.col("vs"), F.lit(" ms"))
    line3164 = F.concat(
        F.lit("<"), pri, F.lit(">"), ts3164,
        F.lit(" h"), _s(t % 5), F.lit(" proc"), _s(t % 6),
        F.when(t % 4 == 0, F.lit("")).otherwise(
            F.concat(F.lit("["), _s(t % 100), F.lit("]"))),
        F.lit(": took "), F.col("vs"), F.lit(" ms"))
    lines = (b.select("scrape_id", "t",
                      F.when(t % 2 == 0, line5424).otherwise(line3164)
                      .alias("line")))
    out = parse_syslog(lines)
    return out.select(
        "scrape_id", "format", "facility", "severity", "severity_name",
        "ts_s", "hostname", "app", "procid", "msgid",
        F.element_at("sd", "k").alias("sd_k"),
        F.element_at("sd", "n").alias("sd_n"), "msg")


def q_csv(spark, sf_dir, tok_dir) -> DataFrame:
    """stanza csv_parser battery (operators/json_parser.py::csv_parser):
    quoted fields containing the delimiter, empty fields, typed
    coercions, and a malformed-line keep — parsed by the JVM CSV
    reader; the oracle derives the expected columns from ``t``."""
    from .operators.json_parser import csv_parser
    b = _base(spark, tok_dir)
    t = F.col("t")
    # name,"quoted, text",count,ratio  — every third row malformed
    good = F.concat(
        F.lit("m"), _s(t % 10), F.lit(',"x, y'), _s(t % 4),
        F.lit('",'), _s(t % 1000), F.lit(","), F.col("vs"))
    line = F.when(t % 3 == 0, F.concat(F.lit('"unterminated,'), _s(t))) \
        .otherwise(good)
    out = csv_parser(
        b.select("scrape_id", "t", line.alias("body")),
        "name string, label string, cnt int, ratio double")
    return out.select("scrape_id", "parsed", "name", "label", "cnt",
                      "ratio")


def q_recombine(spark, sf_dir, tok_dir) -> DataFrame:
    """Multiline recombine battery (operators/recombine.py): a
    deterministic interleaved line stream per synthetic file —
    ``ERROR``-start markers every 4th offset, indented continuation
    frames otherwise — reassembled into stack-trace entries.  The
    oracle runs the identical running-sum + ordered string_agg in
    DuckDB."""
    from .operators.recombine import recombine
    b = _base(spark, tok_dir)
    t = F.col("t")
    line = (F.when(t % 4 == 0,
                   F.concat(F.lit("ERROR boom code="), _s(t % 17)))
            .otherwise(F.concat(F.lit("  at fn"), _s(t % 13),
                                F.lit("(mod.py:"), _s(t % 97),
                                F.lit(")"))))
    lines = b.select(
        F.concat(F.lit("f"), _s(t % 7)).alias("src"),
        t.alias("off"), F.col("scrape_id").alias("tb"),
        line.alias("line"))
    out = recombine(lines, F.col("line").startswith("ERROR"),
                    ["src"], "off", "tb")
    return out.select("src", "entry_id",
                      F.col("first_off").alias("first_o"),
                      "n_lines", "body")


def q_http_forward(spark, sf_dir, tok_dir) -> DataFrame:
    """httpforwarder rewrite battery (operators/http_forwarder.py):
    synthetic requests — varying scheme/authority/path/query, existing
    Via chains, an existing value under the configured extra header —
    pushed through the real rewrite; the oracle re-derives every output
    from t arithmetic."""
    from .operators.http_forwarder import forward_requests
    b = _base(spark, tok_dir)
    t = F.col("t")
    host = F.concat(F.lit("in"), _s(t % 5), F.lit(".example:500"),
                    _s(t % 3))
    url = F.concat(F.lit("http://"), host, F.lit("/v1/p"), _s(t % 7),
                   F.lit("?q="), _s(t % 11))
    proto = F.when(t % 2 == 0, F.lit("HTTP/1.1")).otherwise(
        F.lit("HTTP/2.0"))
    headers = F.map_filter(
        F.map_from_arrays(
            F.array(F.lit("Via"), F.lit("X-Tenant")),
            F.array(
                F.when(t % 3 == 0,
                       F.concat(F.lit("HTTP/1.0 up"), _s(t % 4))),
                F.when(t % 4 == 0, F.concat(F.lit("ten"), _s(t % 6))))),
        lambda _, v: v.isNotNull())
    reqs = b.select("scrape_id", "t", url.alias("url"),
                    proto.alias("proto"), host.alias("host"),
                    headers.alias("headers"))
    out = forward_requests(reqs, "https://gw.example:4318",
                           {"X-Tenant": "edge"})
    return out.select(
        "scrape_id", "fwd_url", "fwd_host",
        F.element_at("headers", "Via").alias("via"),
        F.element_at("headers", "X-Tenant").alias("x_tenant"))


def scrape_queries() -> dict:
    return {
        "syslog_parse": q_syslog,
        "csv_parse": q_csv,
        "recombine_stack": q_recombine,
        "http_forward": q_http_forward,
        "redis_info": q_redis_info,
        "zk_mntr": q_zk_mntr,
        "nginx_status": q_nginx_status,
        "memcached_stats": q_memcached_stats,
        "receiver_creator": q_receiver_creator,
        "docker_stats": q_docker_stats,
        "sfx_translation": q_sfx_translation,
        "kubelet_stats": q_kubelet_stats,
        "ecs_task": q_ecs_task,
        "xray_segments": q_xray_segments,
        "pack_chunks": q_pack_chunks,
        "contamination": q_contamination,
        "rarity": q_rarity,
        "domain_filter": q_domain_filter,
        "pq_codes": q_pq_codes,
        "pq_adc": q_pq_adc,
        "ivfpq_adc": q_ivfpq,
        "emf_events": q_emf_events,
        "dynatrace_lines": q_dynatrace,
        "sentry_transactions": q_sentry,
        "alibaba_logs": q_alibaba,
        "honeycomb_events": q_honeycomb,
        "newrelic_spans": q_newrelic,
        "elastic_errors": q_elastic,
        "elastic_spans": q_elastic_spans,
        "winperf": q_winperf,
        "sfx_receive": q_sfx_receive,
        "sfx_events": q_sfx_events,
        "promexec": q_promexec,
        "jmx_props": q_jmx_props,
    }


def _syslog_oracle(d: str) -> str:
    """Every field re-derived from t arithmetic (never re-parsed)."""
    sev_names = ("['emerg','alert','crit','err','warning','notice',"
                 "'info','debug']")
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
  CASE WHEN t % 2 = 0 THEN 'rfc5424' ELSE 'rfc3164' END AS format,
  CAST((t % 192) // 8 AS INT) AS facility,
  CAST((t % 192) % 8 AS INT) AS severity,
  {sev_names}[CAST((t % 192) % 8 AS INT) + 1] AS severity_name,
  CASE WHEN t % 2 = 0
       THEN strftime(to_timestamp(t) AT TIME ZONE 'UTC',
                     '%Y-%m-%dT%H:%M:%S') || 'Z'
       ELSE strftime(to_timestamp(t) AT TIME ZONE 'UTC', '%b') || ' '
            || CAST(CAST(strftime(to_timestamp(t) AT TIME ZONE 'UTC',
                                  '%d') AS INT) AS VARCHAR) || ' '
            || strftime(to_timestamp(t) AT TIME ZONE 'UTC', '%H:%M:%S')
  END AS ts_s,
  'h' || CAST(t % 5 AS VARCHAR) AS hostname,
  CASE WHEN t % 2 = 0 THEN 'app' || CAST(t % 3 AS VARCHAR)
       ELSE 'proc' || CAST(t % 6 AS VARCHAR) END AS app,
  CASE WHEN t % 4 = 0 THEN NULL
       WHEN t % 2 = 0 THEN CAST(t % 1000 AS VARCHAR)
       ELSE CAST(t % 100 AS VARCHAR) END AS procid,
  CASE WHEN t % 2 = 0 THEN 'ID' || CAST(t % 7 AS VARCHAR) END AS msgid,
  CASE WHEN t % 2 = 0 AND t % 3 <> 0
       THEN 'v' || CAST(t % 9 AS VARCHAR) END AS sd_k,
  CASE WHEN t % 2 = 0 AND t % 3 <> 0
       THEN CAST(t % 11 AS VARCHAR) END AS sd_n,
  'took ' || vs || ' ms' AS msg
FROM base"""


def _csv_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
  (t % 3 <> 0) AS parsed,
  CASE WHEN t % 3 = 0 THEN 'unterminated,' || CAST(t AS VARCHAR)
       ELSE 'm' || CAST(t % 10 AS VARCHAR) END AS name,
  CASE WHEN t % 3 = 0 THEN NULL
       ELSE 'x, y' || CAST(t % 4 AS VARCHAR) END AS label,
  CASE WHEN t % 3 = 0 THEN NULL
       ELSE CAST(t % 1000 AS INT) END AS cnt,
  CASE WHEN t % 3 = 0 THEN NULL ELSE CAST(vs AS DOUBLE) END AS ratio
FROM base"""


def _recombine_oracle(d: str) -> str:
    from .operators.recombine import recombine_oracle_sql
    line = ("CASE WHEN t % 4 = 0 THEN 'ERROR boom code=' "
            "|| CAST(t % 17 AS VARCHAR) "
            "ELSE '  at fn' || CAST(t % 13 AS VARCHAR) || '(mod.py:' "
            "|| CAST(t % 97 AS VARCHAR) || ')' END")
    rc = recombine_oracle_sql(
        "base", f"({line}) LIKE 'ERROR%'",
        "'f' || CAST(t % 7 AS VARCHAR)", "t", "scrape_id", line)
    return (f"WITH {_base_sql(d)}, {rc}\n"
            "SELECT rc_key AS src, entry_id, first_o, n_lines, body "
            "FROM rc")


def _http_forward_oracle(d: str) -> str:
    return f"""WITH {_base_sql(d)}
SELECT scrape_id,
  'https://gw.example:4318/v1/p' || CAST(t % 7 AS VARCHAR)
    || '?q=' || CAST(t % 11 AS VARCHAR) AS fwd_url,
  'gw.example:4318' AS fwd_host,
  CASE WHEN t % 3 = 0
       THEN 'HTTP/1.0 up' || CAST(t % 4 AS VARCHAR) || ', ' ELSE ''
  END || CASE WHEN t % 2 = 0 THEN 'HTTP/1.1' ELSE 'HTTP/2.0' END
    || ' in' || CAST(t % 5 AS VARCHAR) || '.example:500'
    || CAST(t % 3 AS VARCHAR) AS via,
  CASE WHEN t % 4 = 0
       THEN 'ten' || CAST(t % 6 AS VARCHAR) || ', edge'
       ELSE 'edge' END AS x_tenant
FROM base"""


def scrape_oracles(d: str) -> dict[str, str]:
    return {
        "syslog_parse": _syslog_oracle(d),
        "csv_parse": _csv_oracle(d),
        "recombine_stack": _recombine_oracle(d),
        "http_forward": _http_forward_oracle(d),
        "redis_info": _redis_oracle(d),
        "zk_mntr": _zk_oracle(d),
        "nginx_status": _nginx_oracle(d),
        "memcached_stats": _mc_oracle(d),
        "receiver_creator": _rc_oracle(d),
        "docker_stats": _docker_oracle(d),
        "sfx_translation": _sfx_oracle(d),
        "kubelet_stats": _kubelet_oracle(d),
        "ecs_task": _ecs_oracle(d),
        "xray_segments": _xray_oracle(d),
        "pack_chunks": _pack_oracle(d),
        "contamination": _contamination_oracle(d),
        "rarity": _rarity_oracle(d),
        "domain_filter": _domain_oracle(d),
        "pq_codes": _pq_oracle(d),
        "pq_adc": _pq_adc_oracle(d),
        "ivfpq_adc": _ivfpq_oracle(d),
        "emf_events": _emf_oracle(d),
        "dynatrace_lines": _dynatrace_oracle(d),
        "sentry_transactions": _sentry_oracle_wrap(d),
        "alibaba_logs": _alibaba_oracle_wrap(d),
        "honeycomb_events": _honeycomb_oracle_wrap(d),
        "newrelic_spans": _newrelic_oracle_wrap(d),
        "elastic_errors": _elastic_oracle_wrap(d),
        "elastic_spans": _elastic_spans_oracle_wrap(d),
        "winperf": _winperf_oracle(d),
        "sfx_receive": _sfx_receive_oracle(d),
        "sfx_events": _sfx_events_oracle(d),
        "promexec": _promexec_oracle(d),
        "jmx_props": _jmx_oracle(d),
    }
