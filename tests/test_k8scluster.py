"""k8sclusterreceiver analog — unit semantics vs hand-computed goldens."""

import pytest
from pyspark.sql import functions as F, types as T

from opentelemetry_collector_contrib_spark.operators.k8scluster import (
    cluster_metrics, namespace_metrics, node_metrics, pod_metrics,
    quantity_milli, quantity_value, quota_metrics, replica_metrics,
    statefulset_metrics)


def _rows(df):
    return {(r["kind"], r["uid"], r["name"], r["namespace"], r["extra"],
             r["metric"], r["value"]) for r in df.collect()}


CONT_T = T.ArrayType(T.StructType([
    T.StructField("container_id", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("image", T.StringType()),
    T.StructField("restarts", T.IntegerType()),
    T.StructField("ready", T.BooleanType()),
    T.StructField("requests", T.MapType(T.StringType(), T.StringType())),
    T.StructField("limits", T.MapType(T.StringType(), T.StringType())),
]))
PODS_T = T.StructType([
    T.StructField("uid", T.StringType()),
    T.StructField("name", T.StringType()),
    T.StructField("namespace", T.StringType()),
    T.StructField("node", T.StringType()),
    T.StructField("phase", T.StringType()),
    T.StructField("containers", CONT_T),
])


def test_quantity_parser(spark):
    cases = {"250m": (250, 1), "1": (1000, 1), "2": (2000, 2),
             "1Gi": (1024**3 * 1000, 1024**3),
             "128Mi": (128 * 1024**2 * 1000, 128 * 1024**2),
             "536870912": (536870912000, 536870912),
             "1500m": (1500, 2),     # Value() rounds UP (Go Quantity)
             "2k": (2_000_000, 2000), "3M": (3_000_000_000, 3_000_000)}
    df = spark.createDataFrame([(s,) for s in cases], ["q"])
    got = {r["q"]: (r["m"], r["v"]) for r in df.select(
        "q", quantity_milli(F.col("q")).alias("m"),
        quantity_value(F.col("q")).alias("v")).collect()}
    assert got == cases


def test_pod_phase_and_container_rules(spark):
    # pods.go:43-47 phase map incl. default→5; pods.go:64-66 empty-ID
    # skip; utils/kube.go:55-60 scheme strip; containers.go cpu milli
    pods = spark.createDataFrame([
        ("u1", "p1", "ns", "n1", "Running", [
            ("docker://abc", "app", "i", 3, True,
             {"cpu": "500m"}, {"memory": "1Gi"}),
            ("", "ghost", "i", 9, False, {"cpu": "1"}, {}),   # skipped
        ]),
        ("u2", "p2", "ns", "n1", "SomethingOdd", []),
    ], PODS_T)
    got = _rows(pod_metrics(pods))
    assert got == {
        ("pod", "u1", "p1", "ns", "n1", "k8s.pod.phase", 2),
        ("pod", "u2", "p2", "ns", "n1", "k8s.pod.phase", 5),
        ("container", "abc", "p1", "ns", "app", "k8s.container.restarts", 3),
        ("container", "abc", "p1", "ns", "app", "k8s.container.ready", 1),
        ("container", "abc", "p1", "ns", "app",
         "k8s.container.cpu_request", 500),
        ("container", "abc", "p1", "ns", "app",
         "k8s.container.memory_limit", 1024**3),
    }


def test_node_condition_missing_and_unknown(spark):
    # nodes.go:57-71: True→1 False→0 Unknown→-1, missing type→-1
    nodes = spark.createDataFrame(
        [("u1", "n1", {"Ready": "True", "MemoryPressure": "False"}),
         ("u2", "n2", {"Ready": "Unknown"})],
        "uid string, name string, conditions map<string,string>")
    got = _rows(node_metrics(nodes, ("Ready", "MemoryPressure")))
    assert got == {
        ("node", "u1", "n1", None, None, "k8s.node.condition_ready", 1),
        ("node", "u1", "n1", None, None,
         "k8s.node.condition_memory_pressure", 0),
        ("node", "u2", "n2", None, None, "k8s.node.condition_ready", -1),
        ("node", "u2", "n2", None, None,
         "k8s.node.condition_memory_pressure", -1),
    }


def test_namespace_phase_values(spark):
    # namespaces.go:44-49: Active 1, Terminating 0, blank -1, other → 0
    ns = spark.createDataFrame(
        [("u1", "a", "Active"), ("u2", "b", "Terminating"),
         ("u3", "c", ""), ("u4", "d", "Weird")],
        "uid string, name string, phase string")
    vals = {r["name"]: r["value"]
            for r in namespace_metrics(ns).collect()}
    assert vals == {"a": 1, "b": 0, "c": -1, "d": 0}


def test_nil_replicas_skip(spark):
    # deployments.go:25-27 / statefulsets.go:38-40: nil Spec.Replicas
    # objects emit nothing at all
    dep = spark.createDataFrame(
        [("u1", "d1", "ns", 3, 2), ("u2", "d2", "ns", None, 9)],
        "uid string, name string, namespace string, desired int, available int")
    got = _rows(replica_metrics(dep, "deployment"))
    assert {g[1] for g in got} == {"u1"}
    assert ("deployment", "u1", "d1", "ns", None,
            "k8s.deployment.desired", 3) in got

    ss = spark.createDataFrame(
        [("u1", "s1", "ns", None, 1, 1, 1)],
        "uid string, name string, namespace string, desired int, "
        "ready int, current int, updated int")
    assert statefulset_metrics(ss).count() == 0


def test_quota_cpu_suffix_milli(spark):
    # resourcequotas.go:64-68: bare cpu and *.cpu in millicores,
    # everything else whole units; resource name → label (extra)
    rq = spark.createDataFrame(
        [("u1", "q1", "ns",
          {"limits.cpu": "2", "pods": "5"},
          {"cpu": "500m", "requests.memory": "1Gi"})],
        "uid string, name string, namespace string, "
        "hard map<string,string>, used map<string,string>")
    got = _rows(quota_metrics(rq))
    assert got == {
        ("resource_quota", "u1", "q1", "ns", "limits.cpu",
         "k8s.resource_quota.hard_limit", 2000),
        ("resource_quota", "u1", "q1", "ns", "pods",
         "k8s.resource_quota.hard_limit", 5),
        ("resource_quota", "u1", "q1", "ns", "cpu",
         "k8s.resource_quota.used", 500),
        ("resource_quota", "u1", "q1", "ns", "requests.memory",
         "k8s.resource_quota.used", 1024**3),
    }


def test_cluster_metrics_requires_a_snapshot(spark):
    with pytest.raises(ValueError):
        cluster_metrics()
