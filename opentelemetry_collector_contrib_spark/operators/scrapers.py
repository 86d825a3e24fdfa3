"""Pull-scraper receivers re-expressed as batch parsers.

The reference's redis / zookeeper / nginx / memcached receivers each dial
an endpoint, fetch a text payload (INFO / mntr / stub_status / stats) and
translate it into a fixed metric table:

- redis:     receiver/redisreceiver/redis_svc.go:36-54 (INFO -> map,
             ':'-split, '#' comments skipped, len==2 defensive),
             info.go:32-78 (fixed table + keyspace loop breaking at the
             first missing dbN), keyspace.go:34-63, proto.go:36-74,
             metric_functions.go:24-338 (the 26-metric table).
- zookeeper: receiver/zookeeperreceiver/scraper.go:35 (line regex
             ``(^zk_\\w+)\\s+([\\w.-]+)``), 143-177 (version/server_state
             -> resource attributes, unknown keys and non-integer values
             skipped), metrics.go:24-95 (17-metric key->name table).
- nginx:     receiver/nginxreceiver/scraper.go:74-82 (stub_status ->
             7 metrics, sum vs gauge split).
- memcached: receiver/memcachedreceiver/scraper.go:74-90 (5 mapped keys
             out of the stats map; everything else ignored).

Batch shape: the input is a DataFrame of scrape payloads
(scrape_id, body).  Each parser explodes the payload into lines
(narrow, no shuffle), pattern-matches JVM-side, and broadcast-joins the
tiny literal metric table — so a 100 TB scrape archive parses with zero
wide exchanges.  Rows the reference would log-and-skip (unknown keys,
empty or non-numeric values, malformed pairs) are dropped the same way.

``receiver_creator_dispatch`` is the observer + receivercreator analog
(receiver/receivercreator/rules.go:33-62): templates carry a SQL rule
evaluated per endpoint row; every matching template's parser runs over
that endpoint's payloads and the outputs union into one metric stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# redis (metric_functions.go:24-338; units/labels verbatim)
# key -> (metric name, units, 'cumulative'|'gauge', is_double, state label)
# ---------------------------------------------------------------------------

REDIS_METRICS: list[tuple[str, str, str, str, bool, str | None]] = [
    ("uptime_in_seconds", "redis/uptime", "s", "cumulative", False, None),
    ("used_cpu_sys", "redis/cpu/time", "s", "cumulative", True, "sys"),
    ("used_cpu_sys_children", "redis/cpu/time", "s", "cumulative", True,
     "children"),
    ("used_cpu_user", "redis/cpu/time", "s", "cumulative", True, "user"),
    ("connected_clients", "redis/clients/connected", "", "gauge", False, None),
    ("client_recent_max_input_buffer", "redis/clients/max_input_buffer", "",
     "gauge", False, None),
    ("client_recent_max_output_buffer", "redis/clients/max_output_buffer", "",
     "gauge", False, None),
    ("blocked_clients", "redis/clients/blocked", "", "gauge", False, None),
    ("expired_keys", "redis/keys/expired", "", "cumulative", False, None),
    ("evicted_keys", "redis/keys/evicted", "", "cumulative", False, None),
    ("rejected_connections", "redis/connections/rejected", "", "cumulative",
     False, None),
    ("used_memory", "redis/memory/used", "By", "gauge", False, None),
    ("used_memory_rss", "redis/memory/rss", "By", "gauge", False, None),
    ("used_memory_peak", "redis/memory/peak", "By", "gauge", False, None),
    ("used_memory_lua", "redis/memory/lua", "By", "gauge", False, None),
    ("mem_fragmentation_ratio", "redis/memory/fragmentation_ratio", "",
     "gauge", True, None),
    ("rdb_changes_since_last_save", "redis/rdb/changes_since_last_save", "",
     "gauge", False, None),
    ("instantaneous_ops_per_sec", "redis/commands", "{ops}/s", "gauge",
     False, None),
    ("total_connections_received", "redis/connections/received", "",
     "cumulative", False, None),
    ("total_commands_processed", "redis/commands/processed", "",
     "cumulative", False, None),
    ("total_net_input_bytes", "redis/net/input", "By", "cumulative", False,
     None),
    ("total_net_output_bytes", "redis/net/output", "By", "cumulative",
     False, None),
    ("keyspace_hits", "redis/keyspace/hits", "", "cumulative", False, None),
    ("keyspace_misses", "redis/keyspace/misses", "", "cumulative", False,
     None),
    ("latest_fork_usec", "redis/latest_fork", "us", "gauge", False, None),
    ("connected_slaves", "redis/slaves/connected", "", "gauge", False, None),
    ("repl_backlog_first_byte_offset",
     "redis/replication/backlog_first_byte_offset", "", "gauge", False, None),
    ("master_repl_offset", "redis/replication/offset", "", "gauge", False,
     None),
]

_METRIC_SCHEMA = ("scrape_id", "metric_name", "units", "metric_type",
                  "state", "db", "value_i", "value_d")


def _kv_lines(df: DataFrame, body_col: str, id_col: str) -> DataFrame:
    """INFO text -> (scrape_id, key, val): redis_svc.go:41-52 — split
    lines (CRLF on the wire, redis_svc.go delimiter; LF in fixtures),
    drop empties and '#' comments, keep only len==2 ':' splits."""
    lines = df.select(
        F.col(id_col).alias("scrape_id"),
        F.explode(F.split(F.col(body_col), "\r?\n")).alias("line"))
    parts = F.split(F.col("line"), ":")
    return (lines
            .where((F.length("line") > 0) & ~F.col("line").startswith("#"))
            .where(F.size(parts) == 2)
            .select("scrape_id",
                    F.element_at(parts, 1).alias("key"),
                    F.element_at(parts, 2).alias("val")))


def parse_redis_info(df: DataFrame, body_col: str = "body",
                     id_col: str = "scrape_id") -> DataFrame:
    """INFO payloads -> fixed + keyspace metric rows.

    Skip semantics per the reference: unknown keys (info.go:38-41 warns,
    emits nothing), empty values (info.go:43-45), unparsable numerics
    (info.go:46-50), malformed keyspace pairs (keyspace.go:40-46 fails
    the whole dbN line), and dbN beyond the first gap (info.go:63-67
    breaks the 0..15 loop at the first missing db).
    """
    spark = df.sparkSession
    kv = _kv_lines(df, body_col, id_col)

    table = spark.createDataFrame(
        [(k, n, u, t, d, s) for k, n, u, t, d, s in REDIS_METRICS],
        "key string, metric_name string, units string, metric_type string,"
        " is_double boolean, state string")
    fixed = (kv.join(F.broadcast(table), "key")
             .where(F.col("val") != "")
             .select(
                 "scrape_id", "metric_name", "units", "metric_type", "state",
                 F.lit(None).cast("string").alias("db"),
                 F.when(~F.col("is_double"),
                        F.col("val").try_cast("bigint")).alias("value_i"),
                 F.when(F.col("is_double"),
                        F.col("val").try_cast("double")).alias("value_d"))
             .where(F.col("value_i").isNotNull()
                    | F.col("value_d").isNotNull()))

    # keyspace: db0..db15, break at first gap; value "keys=1,expires=2,..."
    from pyspark.sql import Window
    ks = (kv.where(F.col("key").rlike(r"^db([0-9]|1[0-5])$"))
          .withColumn("db_n", F.substring("key", 3, 2).cast("int")))
    w = Window.partitionBy("scrape_id").orderBy("db_n")
    contiguous = (ks.withColumn("pos", F.row_number().over(w) - 1)
                  .where(F.col("db_n") == F.col("pos")))
    pairs = F.split(F.col("val"), ",")
    valid = F.forall(pairs, lambda p: F.size(F.split(p, "=")) == 2)
    kmap = F.str_to_map(F.col("val"), F.lit(","), F.lit("="))
    triplet = F.array(*[
        F.struct(F.lit(name).alias("n"), F.lit(units).alias("u"),
                 F.element_at("m", sub).alias("v"))
        for name, units, sub in [("redis/db/keys", "", "keys"),
                                 ("redis/db/expires", "", "expires"),
                                 ("redis/db/avg_ttl", "ms", "avg_ttl")]])
    ks_rows = (contiguous.where(valid)
               .select("scrape_id", F.col("db_n").cast("string").alias("db"),
                       kmap.alias("m"))
               .select("scrape_id", "db", F.explode(triplet).alias("s"))
               # missing sub-keys default 0 (keyspace.go struct zero values)
               .select("scrape_id", F.col("s.n").alias("metric_name"),
                       F.col("s.u").alias("units"),
                       F.lit("gauge").alias("metric_type"),
                       F.lit(None).cast("string").alias("state"), "db",
                       F.coalesce(F.col("s.v").try_cast("bigint"),
                                  F.lit(0)).alias("value_i"),
                       F.lit(None).cast("double").alias("value_d")))
    return fixed.select(*_METRIC_SCHEMA).unionByName(
        ks_rows.select(*_METRIC_SCHEMA))


# ---------------------------------------------------------------------------
# zookeeper (scraper.go:35,143-177; metrics.go:24-95)
# ---------------------------------------------------------------------------

ZK_METRICS: list[tuple[str, str, str]] = [
    ("zk_avg_latency", "zookeeper.latency.avg", "gauge"),
    ("zk_max_latency", "zookeeper.latency.max", "gauge"),
    ("zk_min_latency", "zookeeper.latency.min", "gauge"),
    ("zk_packets_received", "zookeeper.packets.received", "sum"),
    ("zk_packets_sent", "zookeeper.packets.sent", "sum"),
    ("zk_num_alive_connections", "zookeeper.connections_alive", "gauge"),
    ("zk_outstanding_requests", "zookeeper.outstanding_requests", "gauge"),
    ("zk_znode_count", "zookeeper.znodes", "gauge"),
    ("zk_watch_count", "zookeeper.watches", "gauge"),
    ("zk_ephemerals_count", "zookeeper.ephemeral_nodes", "gauge"),
    ("zk_approximate_data_size", "zookeeper.approximate_date_size", "gauge"),
    ("zk_open_file_descriptor_count", "zookeeper.open_file_descriptors",
     "gauge"),
    ("zk_max_file_descriptor_count", "zookeeper.max_file_descriptors",
     "gauge"),
    ("zk_fsync_threshold_exceed_count", "zookeeper.fsync_threshold_exceeds",
     "sum"),
    ("zk_followers", "zookeeper.followers", "gauge"),
    ("zk_synced_followers", "zookeeper.synced_followers", "gauge"),
    ("zk_pending_syncs", "zookeeper.pending_syncs", "gauge"),
]

_ZK_LINE_RX = r"(^zk_\w+)\s+([\w.\-]+)"


def parse_zookeeper_mntr(df: DataFrame, body_col: str = "body",
                         id_col: str = "scrape_id") -> DataFrame:
    """mntr payloads -> metric rows + per-scrape resource attributes.

    ``zk_version`` / ``zk_server_state`` become resource attributes
    carried on every row (scraper.go:154-160); unknown keys and
    non-integer values are skipped (scraper.go:161-173).
    """
    spark = df.sparkSession
    lines = df.select(
        F.col(id_col).alias("scrape_id"),
        F.explode(F.split(F.col(body_col), "\r?\n")).alias("line"))
    kv = (lines
          .select("scrape_id",
                  F.regexp_extract("line", _ZK_LINE_RX, 1).alias("key"),
                  F.regexp_extract("line", _ZK_LINE_RX, 2).alias("val"))
          .where(F.col("key") != ""))
    attrs = (kv.where(F.col("key").isin("zk_version", "zk_server_state"))
             .groupBy("scrape_id")
             .pivot("key", ["zk_version", "zk_server_state"])
             .agg(F.first("val"))
             .withColumnRenamed("zk_version", "zk_version_attr")
             .withColumnRenamed("zk_server_state", "server_state"))
    table = spark.createDataFrame(
        ZK_METRICS, "key string, metric_name string, metric_type string")
    stats = (kv.join(F.broadcast(table), "key")
             .withColumn("value_i", F.col("val").try_cast("bigint"))
             .where(F.col("value_i").isNotNull()))
    return (stats.join(attrs, "scrape_id", "left")
            .select("scrape_id", "metric_name", "metric_type", "value_i",
                    F.col("zk_version_attr").alias("zk_version"),
                    "server_state"))


# ---------------------------------------------------------------------------
# nginx stub_status (scraper.go:74-82)
# ---------------------------------------------------------------------------

_NGINX_ACTIVE_RX = r"Active connections: (\d+)"
_NGINX_AHR_RX = r"server accepts handled requests\s+(\d+) (\d+) (\d+)"
_NGINX_RWW_RX = r"Reading: (\d+) Writing: (\d+) Waiting: (\d+)"

# (metric name, 'sum'|'gauge', extractor regex, group)
NGINX_METRICS: list[tuple[str, str, str, int]] = [
    ("nginx.connections_active", "gauge", _NGINX_ACTIVE_RX, 1),
    ("nginx.connections_accepted", "sum", _NGINX_AHR_RX, 1),
    ("nginx.connections_handled", "sum", _NGINX_AHR_RX, 2),
    ("nginx.requests", "sum", _NGINX_AHR_RX, 3),
    ("nginx.connections_reading", "gauge", _NGINX_RWW_RX, 1),
    ("nginx.connections_writing", "gauge", _NGINX_RWW_RX, 2),
    ("nginx.connections_waiting", "gauge", _NGINX_RWW_RX, 3),
]


def parse_nginx_stub_status(df: DataFrame, body_col: str = "body",
                            id_col: str = "scrape_id") -> DataFrame:
    """stub_status pages -> the 7 nginx metrics (one stack per scrape).

    A page that fails any of the three extraction patterns contributes
    no rows for that pattern (the reference client errors the scrape)."""
    cols = [
        F.struct(F.lit(name).alias("metric_name"),
                 F.lit(mtype).alias("metric_type"),
                 F.regexp_extract(F.col(body_col), rx, g)
                 .try_cast("bigint").alias("value_i"))
        for name, mtype, rx, g in NGINX_METRICS
    ]
    out = (df.select(F.col(id_col).alias("scrape_id"),
                     F.explode(F.array(*cols)).alias("m"))
           .select("scrape_id", "m.metric_name", "m.metric_type", "m.value_i")
           .where(F.col("value_i").isNotNull()))
    return out


# ---------------------------------------------------------------------------
# memcached stats (scraper.go:74-90)
# ---------------------------------------------------------------------------

MEMCACHED_METRICS: list[tuple[str, str, str]] = [
    ("bytes", "memcached.bytes", "gauge"),
    ("curr_connections", "memcached.current_connections", "gauge"),
    ("total_connections", "memcached.total_connections", "sum"),
    ("get_hits", "memcached.get_hits", "sum"),
    ("get_misses", "memcached.get_misses", "sum"),
]

_MC_LINE_RX = r"^STAT (\S+) (\S+)$"


def parse_memcached_stats(df: DataFrame, body_col: str = "body",
                          id_col: str = "scrape_id") -> DataFrame:
    """``STAT <key> <value>`` payloads -> the 5 mapped memcached metrics;
    unmapped keys are ignored (the reference switches on 5 cases)."""
    spark = df.sparkSession
    lines = df.select(
        F.col(id_col).alias("scrape_id"),
        F.explode(F.split(F.col(body_col), "\r?\n")).alias("line"))
    kv = (lines
          .select("scrape_id",
                  F.regexp_extract("line", _MC_LINE_RX, 1).alias("key"),
                  F.regexp_extract("line", _MC_LINE_RX, 2).alias("val"))
          .where(F.col("key") != ""))
    table = spark.createDataFrame(
        MEMCACHED_METRICS, "key string, metric_name string, metric_type string")
    return (kv.join(F.broadcast(table), "key")
            .withColumn("value_i", F.col("val").try_cast("bigint"))
            .where(F.col("value_i").isNotNull())
            .select("scrape_id", "metric_name", "metric_type", "value_i"))


# ---------------------------------------------------------------------------
# receivercreator / observer (rules.go:33-62, observerhandler.go)
# ---------------------------------------------------------------------------

@dataclass
class ReceiverTemplate:
    """One `receivers:` entry of the receivercreator config: instantiate
    ``receiver_type`` for every endpoint whose row satisfies ``rule``
    (a SQL predicate over the endpoint columns — the expr-language
    analog; the reference requires the rule to mention the endpoint
    type, rules.go:33-43)."""
    receiver_type: str
    rule: str


_DISPATCH_SCHEMA = ("scrape_id", "receiver", "metric_name", "metric_type",
                    "value_i", "value_d")

_PARSERS = {
    "redis": parse_redis_info,
    "zookeeper": parse_zookeeper_mntr,
    "nginx": parse_nginx_stub_status,
    "memcached": parse_memcached_stats,
}


def receiver_creator_dispatch(endpoints: DataFrame,
                              templates: list[ReceiverTemplate],
                              body_col: str = "body",
                              id_col: str = "scrape_id") -> DataFrame:
    """Observer+receivercreator analog: ``endpoints`` is the discovered
    endpoint table (one row per scrape payload with endpoint metadata
    columns — host, port, endpoint_type, ...).  Every template whose
    rule matches an endpoint row instantiates its receiver over that
    row's payload; outputs union into one metric stream tagged with the
    receiver type.  Unmatched endpoints are dropped (no receiver is
    created for them — observerhandler semantics).
    """
    if not templates:
        raise ValueError("at least one receiver template required")
    outs = []
    for t in templates:
        if t.receiver_type not in _PARSERS:
            raise ValueError(f"unknown receiver type: {t.receiver_type}")
        sub = endpoints.where(F.expr(t.rule))
        parsed = _PARSERS[t.receiver_type](sub, body_col=body_col,
                                           id_col=id_col)
        norm = parsed
        if "value_d" not in norm.columns:
            norm = norm.withColumn("value_d", F.lit(None).cast("double"))
        outs.append(norm.select(
            "scrape_id", F.lit(t.receiver_type).alias("receiver"),
            "metric_name", "metric_type",
            F.col("value_i").cast("bigint").alias("value_i"), "value_d"))
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res
