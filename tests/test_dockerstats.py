"""dockerstatsreceiver translation (metrics.go:45-288 semantics)."""

import json

from opentelemetry_collector_contrib_spark.operators.dockerstats import (
    parse_docker_stats,
)

STATS = {
    "cpu_stats": {
        "cpu_usage": {
            "total_usage": 500_000_000,
            "usage_in_kernelmode": 100_000_000,
            "usage_in_usermode": 400_000_000,
            "percpu_usage": [250_000_000, 250_000_000],
        },
        "system_cpu_usage": 10_000_000_000,
        "online_cpus": 0,                       # -> fallback to percpu len 2
        "throttling_data": {"periods": 10, "throttled_periods": 2,
                            "throttled_time": 5_000},
    },
    "precpu_stats": {
        "cpu_usage": {"total_usage": 400_000_000},
        "system_cpu_usage": 9_000_000_000,
    },
    "memory_stats": {
        "usage": 1_000_000, "max_usage": 2_000_000, "limit": 4_000_000,
        "stats": {"cache": 100_000, "total_cache": 150_000,
                  "rss": 700_000, "pgfault": 42},
    },
    "networks": {
        "eth0": {"rx_bytes": 1, "tx_bytes": 2, "rx_dropped": 3,
                 "rx_errors": 4, "rx_packets": 5, "tx_dropped": 6,
                 "tx_errors": 7, "tx_packets": 8},
    },
    "blkio_stats": {
        "io_service_bytes_recursive": [
            {"major": 8, "minor": 0, "op": "Read", "value": 1000},
            {"major": 8, "minor": 0, "op": "", "value": 9},   # skipped
        ],
        "io_serviced_recursive": [
            {"major": 8, "minor": 16, "op": "Write", "value": 7},
        ],
    },
}


def _parse(spark, stats):
    df = spark.createDataFrame([("c1", json.dumps(stats))],
                               "scrape_id string, stats_json string")
    return parse_docker_stats(df)


def test_docker_stats_battery(spark):
    rows = {(r.metric_name, r.interface, r.device_major, r.device_minor): r
            for r in _parse(spark, STATS).collect()}

    # cpu cumulative + percent (delta 1e8 / 1e9 * 2 cores * 100 = 20.0)
    key = ("container.cpu.usage.total", None, None, None)
    assert rows[key].value_i == 500_000_000
    assert rows[key].metric_type == "cumulative"
    assert rows[("container.cpu.percent", None, None, None)].value_d == 20.0

    # memory: usage.total = usage - total_cache; percent uses 'cache'
    assert rows[("container.memory.usage.total", None, None, None)] \
        .value_i == 850_000
    assert rows[("container.memory.percent", None, None, None)] \
        .value_d == 100.0 * (1_000_000 - 100_000) / 4_000_000
    # stats map: pgfault cumulative "1", rss gauge "By"
    assert rows[("container.memory.pgfault", None, None, None)] \
        .metric_type == "cumulative"
    assert rows[("container.memory.rss", None, None, None)] \
        .metric_type == "gauge"
    assert rows[("container.memory.rss", None, None, None)].units == "By"

    # network per-interface cumulative
    assert rows[("container.network.io.usage.rx_bytes", "eth0", None, None)] \
        .value_i == 1
    assert rows[("container.network.io.usage.tx_packets", "eth0", None,
                 None)].value_i == 8

    # blkio: op lowercased into the name, empty-op entry skipped
    assert rows[("container.blockio.io_service_bytes_recursive.read", None,
                 "8", "0")].value_i == 1000
    assert rows[("container.blockio.io_serviced_recursive.write", None,
                 "8", "16")].value_i == 7
    assert not any(k[0].endswith(".") for k in rows)


def test_docker_cpu_percent_guards(spark):
    # negative system delta -> 0
    bad = json.loads(json.dumps(STATS))
    bad["precpu_stats"]["system_cpu_usage"] = 20_000_000_000
    rows = {r.metric_name: r for r in _parse(spark, bad).collect()}
    assert rows["container.cpu.percent"].value_d == 0.0

    # limit 0 -> memory.percent 0
    bad2 = json.loads(json.dumps(STATS))
    bad2["memory_stats"]["limit"] = 0
    rows2 = {r.metric_name: r for r in _parse(spark, bad2).collect()}
    assert rows2["container.memory.percent"].value_d == 0.0

    # online_cpus nonzero wins over percpu fallback
    oc = json.loads(json.dumps(STATS))
    oc["cpu_stats"]["online_cpus"] = 4
    rows3 = {r.metric_name: r for r in _parse(spark, oc).collect()}
    assert rows3["container.cpu.percent"].value_d == 40.0


def test_docker_missing_fields_are_go_zero_values(spark):
    # docker API < v1.27: no online_cpus, no throttling_data -> Go zero
    # values, with the percpu-length fallback driving cpu.percent
    slim = {
        "cpu_stats": {"cpu_usage": {"total_usage": 600,
                                    "percpu_usage": [1, 2]},
                      "system_cpu_usage": 1100},
        "precpu_stats": {"cpu_usage": {"total_usage": 100},
                         "system_cpu_usage": 100},
        "memory_stats": {"usage": 50, "limit": 100, "stats": {}},
    }
    rows = {r.metric_name: r for r in _parse(spark, slim).collect()}
    assert rows["container.cpu.percent"].value_d == \
        (600 - 100) / (1100 - 100) * 2 * 100.0
    assert rows["container.cpu.throttling_data.periods"].value_i == 0
    assert rows["container.cpu.usage.kernelmode"].value_i == 0
    assert rows["container.memory.usage.max"].value_i == 0
