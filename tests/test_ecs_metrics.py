"""awsecscontainermetrics translation (metrics_helper.go/accumulator.go)."""

import json

from opentelemetry_collector_contrib_spark.operators.ecs_metrics import (
    container_ecs_metrics, ecs_task_metrics,
)


def _stats(total=500_000, pre=100_000, cache=1 << 20, usage=5 << 20,
           nets=None, blkio=None):
    return {
        "read": "2020-08-25T10:00:02Z",
        "preread": "2020-08-25T10:00:00Z",
        "cpu_stats": {
            "cpu_usage": {"total_usage": total, "usage_in_kernelmode": 10,
                          "usage_in_usermode": 20,
                          "percpu_usage": [1, 2, 3, 4]},
            "system_cpu_usage": 999, "online_cpus": 4,
        },
        "precpu_stats": {"cpu_usage": {"total_usage": pre}},
        "memory_stats": {"usage": usage, "max_usage": usage * 2,
                         "limit": 10 << 20, "stats": {"cache": cache}},
        "networks": nets if nets is not None else {
            "eth0": {"rx_bytes": 10, "rx_packets": 1, "rx_errors": 0,
                     "rx_dropped": 0, "tx_bytes": 20, "tx_packets": 2,
                     "tx_errors": 0, "tx_dropped": 0},
            "eth1": {"rx_bytes": 5, "rx_packets": 1, "rx_errors": 1,
                     "rx_dropped": 0, "tx_bytes": 7, "tx_packets": 1,
                     "tx_errors": 0, "tx_dropped": 1},
        },
        "network_rate_stats": {"rx_bytes_per_sec": 1.5,
                               "tx_bytes_per_sec": 2.5},
        "blkio_stats": {"io_service_bytes_recursive": blkio or [
            {"op": "Read", "value": 100}, {"op": "Write", "value": 200},
            {"op": "Read", "value": 150},        # last Read wins
            {"op": "Total", "value": 999},       # ignored
        ]},
    }


SCHEMA = ("task_id string, container_name string, stats_json string, "
          "mem_limit long, cpu_limit double, task_mem_limit long, "
          "task_cpu_limit double")


def test_container_metrics(spark):
    df = spark.createDataFrame(
        [("t1", "c1", json.dumps(_stats()), 512, 256.0, None, None)], SCHEMA)
    r = container_ecs_metrics(df).collect()[0]
    # vcpu = (500000-100000) / 2e9 ; utilized = vcpu*100 / reserved(256)
    vcpu = (500_000 - 100_000) / 2e9
    assert r.cpu_usage_vcpu == vcpu
    assert r.cpu_utilized == vcpu * 100.0 / 256.0
    assert r.num_cpu_cores == 4
    # memory.utilized = (usage - cache) DIV MiB = (5MiB-1MiB)/MiB = 4
    assert r.memory_utilized == 4
    assert r.memory_reserved == 512
    # network summed across eth0+eth1
    assert r.network_rx_bytes == 15
    assert r.network_tx_packets == 3
    assert r.network_rx_errors == 1
    # storage: LAST Read entry, Total ignored
    assert r.storage_read_bytes == 150
    assert r.storage_write_bytes == 200
    assert r.network_rate_rx == 1.5


def test_task_rollup_and_limits(spark):
    rows = [
        ("t1", "c1", json.dumps(_stats(total=300_000)), 512, 512.0,
         None, 2.0),
        ("t1", "c2", json.dumps(_stats(total=700_000)), 256, 512.0,
         None, 2.0),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {(r.scope, r.name): r for r in ecs_task_metrics(df).collect()}
    task = out[("task", "t1")]
    # sums
    assert task.memory_utilized == 8
    assert task.network_rx_bytes == 30
    assert task.num_cpu_cores == 8
    # task cpu.reserved overridden by the task-level limit (2.0 vCPU)
    assert task.cpu_reserved == 2.0
    vcpu_sum = (300_000 - 100_000) / 2e9 + (700_000 - 100_000) / 2e9
    assert task.cpu_utilized == vcpu_sum / 2.0 * 100.0
    # memory reserved: no task limit -> sum of container reserves
    assert task.memory_reserved == 512 + 256
    # container rows ride along
    assert out[("container", "c1")].memory_reserved == 512


def test_task_cpu_reserved_fallback(spark):
    rows = [("t2", "c1", json.dumps(_stats()), None, 512.0, None, None),
            ("t2", "c2", json.dumps(_stats()), None, 512.0, None, None)]
    df = spark.createDataFrame(rows, SCHEMA)
    task = [r for r in ecs_task_metrics(df).collect()
            if r.scope == "task"][0]
    # sum(512+512)/1024 = 1.0 vCPU
    assert task.cpu_reserved == 1.0


def test_sparse_payload_defaults_to_zero(spark):
    # no Read blkio entries, no networks, no rate stats -> zeros, not a
    # crash (ANSI element_at(-1) on an empty array throws without the
    # try_ variant)
    sparse = _stats(blkio=[{"op": "Write", "value": 5}], nets={})
    df = spark.createDataFrame(
        [("t1", "c1", json.dumps(sparse), None, None, None, None)], SCHEMA)
    r = container_ecs_metrics(df).collect()[0]
    assert r.storage_read_bytes == 0 and r.storage_write_bytes == 5
    assert r.network_rx_bytes == 0
    assert r.cpu_reserved == 0.0
