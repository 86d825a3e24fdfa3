"""kubeletstats summary translation (accumulator.go:60-158 semantics)."""

import json

import pytest

from opentelemetry_collector_contrib_spark.operators.kubeletstats import (
    parse_kubelet_summary,
)

SUMMARY = {
    "node": {
        "nodeName": "node-1",
        "cpu": {"usageNanoCores": 500_000_000,
                "usageCoreNanoSeconds": 3_000_000_000},
        "memory": {"availableBytes": 1000, "usageBytes": 2000,
                   "rssBytes": 1500, "workingSetBytes": 1800,
                   "pageFaults": 10, "majorPageFaults": 1},
        "fs": {"availableBytes": 50, "capacityBytes": 100, "usedBytes": 50},
        "network": {"name": "eth0", "rxBytes": 11, "txBytes": 22,
                    "rxErrors": 1, "txErrors": 2},
    },
    "pods": [{
        "podRef": {"name": "pod-a", "namespace": "ns1", "uid": "u1"},
        "cpu": {"usageNanoCores": 250_000_000,
                "usageCoreNanoSeconds": 1_000_000_000},
        "memory": {"usageBytes": 900},     # other mem fields nil -> skipped
        "ephemeral-storage": {"availableBytes": 5, "capacityBytes": 10,
                              "usedBytes": 5},
        "network": {"name": "eth0", "rxBytes": 1, "txBytes": 2,
                    "rxErrors": 0, "txErrors": 0},
        "containers": [{
            "name": "app",
            "cpu": {"usageNanoCores": 100_000_000,
                    "usageCoreNanoSeconds": 400_000_000},
            "memory": {"workingSetBytes": 321},
            "rootfs": {"usedBytes": 7},
        }],
        "volume": [{
            "name": "vol-1", "availableBytes": 800, "capacityBytes": 1000,
            "inodes": 64, "inodesFree": 60, "inodesUsed": 4,
        }],
    }],
}


def _parse(spark, groups=("node", "pod", "container", "volume")):
    df = spark.createDataFrame([("s1", json.dumps(SUMMARY))],
                               "scrape_id string, summary_json string")
    return parse_kubelet_summary(df, metric_groups=groups)


def test_kubelet_all_groups(spark):
    rows = [r.asDict() for r in _parse(spark).collect()]
    by = {(r["grp"], r["metric_name"], r.get("interface"),
           r.get("direction"), r.get("container_name"),
           r.get("volume_name")): r for r in rows}

    # node: cpu.utilization = nanocores/1e9 (double gauge)
    n = by[("node", "k8s.node.cpu.utilization", None, None, None, None)]
    assert n["value_d"] == 0.5 and n["node_name"] == "node-1"
    assert by[("node", "k8s.node.cpu.time", None, None, None, None)][
        "metric_type"] == "cumulative"
    # node network labelled by interface+direction
    rx = by[("node", "k8s.node.network.io", "eth0", "receive", None, None)]
    assert rx["value_i"] == 11

    # pod: nil memory fields emit nothing
    assert ("pod", "k8s.pod.memory.rss", None, None, None, None) not in by
    p = by[("pod", "k8s.pod.memory.usage", None, None, None, None)]
    assert p["value_i"] == 900 and p["pod_name"] == "pod-a"
    assert p["namespace"] == "ns1"
    # ephemeral-storage feeds the pod filesystem gauges
    assert by[("pod", "k8s.pod.filesystem.capacity", None, None, None,
               None)]["value_i"] == 10

    # container: no network battery, rootfs feeds filesystem
    assert by[("container", "container.memory.working_set", None, None,
               "app", None)]["value_i"] == 321
    assert by[("container", "container.filesystem.usage", None, None,
               "app", None)]["value_i"] == 7
    assert not any(k[0] == "container" and "network" in k[1] for k in by)

    # volume gauges carry the volume name
    assert by[("volume", "k8s.volume.inodes.free", None, None, None,
               "vol-1")]["value_i"] == 60


def test_kubelet_group_filter(spark):
    rows = _parse(spark, groups=("pod",)).collect()
    assert rows and all(r.grp == "pod" for r in rows)
    with pytest.raises(ValueError):
        _parse(spark, groups=("pod", "bogus"))
