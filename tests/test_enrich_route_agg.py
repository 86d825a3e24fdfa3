"""Enrich (broadcast join precedence), routing (table/default/fan-out),
groupbyattrs (cardinality matrix + self-metrics), resource detection.

Mirrors: k8sprocessor insert-if-absent (processor.go:137-140),
routingprocessor (routing.go:132-146), groupbyattrs cardinalities
(processor_test.go:130-150), resourcedetection Insert/Upsert
(internal/resourcedetection.go:176-189)."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.enrich import (
    broadcast_enrich, prepare_pods_dim)
from opentelemetry_collector_contrib_spark.operators.groupbyattrs import (
    group_by_attrs, group_by_attrs_metrics)
from opentelemetry_collector_contrib_spark.operators.resource_detection import (
    resource_detection)
from opentelemetry_collector_contrib_spark.operators.routing import (
    RoutingTable, exploded, fanout, with_route)

from conftest import rows

ROUTES = RoutingTable(
    from_attribute="source",
    table={"a": ["s1"], "b": ["s1", "s2"]},
    default_sinks=["dflt"])


def _events(spark):
    return spark.createDataFrame(
        [("e1", "1.1.1.1", None), ("e2", "2.2.2.2", "keepme"),
         ("e3", "9.9.9.9", None)],
        "id string, pod_ip string, namespace string")


def _dim(spark):
    return spark.createDataFrame(
        [("1.1.1.1", "ns1", "pod-1"), ("2.2.2.2", "ns2", "pod-2")],
        "pod_ip string, namespace string, pod_name string")


def test_enrich_insert_if_absent(spark):
    """InsertString semantics: existing event attribute wins."""
    out = broadcast_enrich(_events(spark), _dim(spark), "pod_ip")
    got = {r["id"]: (r["namespace"], r["pod_name"]) for r in out.collect()}
    assert got["e1"] == ("ns1", "pod-1")       # filled from dim
    assert got["e2"] == ("keepme", "pod-2")    # existing wins
    assert got["e3"] == (None, None)           # lookup miss -> passthrough


def test_enrich_upsert(spark):
    out = broadcast_enrich(_events(spark), _dim(spark), "pod_ip", mode="upsert")
    got = {r["id"]: r["namespace"] for r in out.collect()}
    assert got["e2"] == "ns2"                  # looked-up value wins


def test_prepare_pods_dim(spark):
    pods = spark.createDataFrame(
        [("1.1.1.1", "frontend-5c9f8-x2v9z", "ns", "n1", "t", "GIT_SHA=abc12 X", False),
         ("2.2.2.2", "bad", "ns", "n1", "t", "", True)],
        "pod_ip string, pod_name string, namespace string, node_name string, "
        "start_time string, labels_raw string, ignore boolean")
    out = prepare_pods_dim(pods).collect()
    assert len(out) == 1                        # ignored pod dropped
    assert out[0]["deployment"] == "frontend"   # client.go:55 regex
    assert out[0]["git_sha"] == "abc12"


def test_pods_dim_duplicate_ip_newest_start_time_wins(spark):
    """Same-IP conflict: the pod with the newest StartTime owns the IP
    (kube/client.go:278-283); duplicate-IP dim rows must NOT fan out
    fact rows through the broadcast join."""
    pods = spark.createDataFrame(
        [("10.0.0.1", "app-old-aaaaa-11111", "ns1", "n1",
          "2020-01-01T00:00:00Z", "GIT_SHA=old11 X", False),
         ("10.0.0.1", "app-new-bbbbb-22222", "ns2", "n2",
          "2021-06-01T00:00:00Z", "GIT_SHA=new22 X", False)],
        "pod_ip string, pod_name string, namespace string, node_name string, "
        "start_time string, labels_raw string, ignore boolean")
    dim = prepare_pods_dim(pods)
    got = dim.collect()
    assert len(got) == 1
    assert got[0]["pod_name"] == "app-new-bbbbb-22222"
    events = spark.createDataFrame([("d1", "10.0.0.1"), ("d2", "10.0.0.1")],
                                   "doc_id string, pod_ip string")
    out = broadcast_enrich(events, dim, "pod_ip")
    assert out.count() == 2                     # row count stable
    assert all(r["git_sha"] == "new22" for r in out.collect())


def test_routing_table_and_default(spark):
    df = spark.createDataFrame(
        [("r1", "a"), ("r2", "b"), ("r3", "zzz"), ("r4", None)],
        "id string, source string")
    got = {r["id"]: sorted(r["sinks"]) for r in with_route(df, ROUTES).collect()}
    assert got["r1"] == ["s1"]
    assert got["r2"] == ["s1", "s2"]            # fan-out to 2 sinks
    assert got["r3"] == ["dflt"]                # value not in table
    assert got["r4"] == ["dflt"]                # attribute missing


def test_fanout_matches_exploded(spark):
    df = spark.createDataFrame(
        [("r1", "a"), ("r2", "b"), ("r3", "x")], "id string, source string")
    branches = fanout(df, ROUTES)
    flat = sorted((s, r["id"]) for s, b in branches.items()
                  for r in b.collect())
    ex = sorted((r["sink"], r["id"])
                for r in exploded(df, ROUTES).collect())
    assert flat == ex == [("dflt", "r3"), ("s1", "r1"), ("s1", "r2"),
                          ("s2", "r2")]


def test_groupbyattrs_cardinality(spark):
    df = spark.createDataFrame(
        [("x", "ns1"), ("y", "ns1"), ("z", "ns2"), ("w", None)],
        "id string, namespace string")
    got = rows(group_by_attrs(df, ["namespace"]))
    # one group per distinct key incl. the NULL (non-grouped) group
    assert got == [("ns1", 2), ("ns2", 1), (None, 1)]


def test_groupbyattrs_metrics(spark):
    df = spark.createDataFrame(
        [("x", "ns1", None), ("y", None, "d1"), ("z", None, None)],
        "id string, namespace string, deployment string")
    got = group_by_attrs_metrics(df, ["namespace", "deployment"]).collect()[0]
    assert got["num_grouped"] == 2
    assert got["num_non_grouped"] == 1
    assert got["num_groups"] == 3


def test_resource_detection_insert_vs_upsert(spark):
    df = spark.createDataFrame([("e1", None), ("e2", "mine")],
                               "id string, cloud string")
    ins = {r["id"]: r["cloud"] for r in
           resource_detection(df, {"cloud": "aws"}).collect()}
    ups = {r["id"]: r["cloud"] for r in
           resource_detection(df, {"cloud": "aws"}, override=True).collect()}
    assert ins == {"e1": "aws", "e2": "mine"}    # Insert: existing wins
    assert ups == {"e1": "aws", "e2": "aws"}     # Upsert: detected wins


def test_resource_detection_new_column(spark):
    df = spark.createDataFrame([("e1",)], "id string")
    out = resource_detection(df, {"region": "eu"}).collect()[0]
    assert out["region"] == "eu"


def test_groupbyattrs_map_variant(spark):
    from opentelemetry_collector_contrib_spark.operators.groupbyattrs import (
        group_by_attrs_map)
    df = spark.createDataFrame(
        [("a", {"ns": "n1", "x": "1"}), ("b", {"ns": "n1"}),
         ("c", {"x": "9"})],
        "id string, attrs map<string,string>")
    got = rows(group_by_attrs_map(df, "attrs", ["ns"]))
    assert got == [("n1", 2), (None, 1)]


def test_rate_limit_caps_per_key_per_interval(spark):
    from opentelemetry_collector_contrib_spark.operators.filters import (
        rate_limit)
    rows = ([("a", t, f"e{t}") for t in range(6)]          # 6 in bucket 0
            + [("a", 1000 + t, f"l{t}") for t in range(2)]  # 2 in bucket 1
            + [("b", 3, "x")])
    df = spark.createDataFrame(rows, "k string, t long, id string")
    out = rate_limit(df, rate=3, interval_ms=1000, key_cols=["k"],
                     time_col="t", tiebreak="id")
    got = sorted((r["k"], r["t"]) for r in out.collect())
    # earliest 3 of a's first second, both of its second second, all b
    assert got == [("a", 0), ("a", 1), ("a", 2),
                   ("a", 1000), ("a", 1001), ("b", 3)]
    assert set(out.columns) == {"k", "t", "id"}
