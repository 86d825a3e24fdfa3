"""k8sclusterreceiver analog — cluster-object snapshot → per-object metrics.

The reference watches the k8s API and, per object, emits a small battery
of gauge metrics keyed by the object's resource labels
(``receiver/k8sclusterreceiver/collection/collector.go`` ``SyncMetrics``
switch).  The batch analog: each object kind arrives as a snapshot
DataFrame (one row per object, already the joined spec+status view) and
this module turns it into a unified flat metric table:

    (kind, uid, name, namespace, extra, metric, value:bigint)

where ``extra`` carries the kind-specific third dimension (pod→node,
container→container name, resource_quota→the ``resource`` metric label).

Semantics mirrored, with reference cites:

- pod phase gauge 1-5, unknown/default → 5
  (``collection/pods.go:43-47`` ``phaseToInt``: Pending 1, Running 2,
  Succeeded 3, Failed 4, Unknown/default 5);
- containers: statuses with empty ContainerID are skipped entirely —
  both their status metrics and their spec metrics
  (``pods.go:64-66`` skip, ``pods.go:74-83`` cr==nil skip);
  ``container.id`` is the status ID with the ``scheme://`` prefix
  stripped (``utils/kube.go:55-60``);
- container status: ``k8s.container.restarts``, ``k8s.container.ready``
  0/1 (``containers.go:62-80``); container spec: per resource-list entry
  ``k8s.container.<resource>_<request|limit>``, CPU as millicores, all
  others as rounded-up integer units (``containers.go:88-131``:
  ``Value()`` / ``MilliValue()`` of a k8s Quantity);
- node conditions: one ``k8s.node.condition_<snake>`` gauge per
  *configured* condition type, True→1 False→0 Unknown/missing→-1
  (``nodes.go:19-41,57-71``);
- namespace phase: Active→1 Terminating→0 blank→-1, any other
  string → 0, the Go map zero value (``namespaces.go:44-49``);
- deployment / replicaset / replication_controller: skip the object when
  ``Spec.Replicas`` is nil, else ``k8s.<kind>.desired`` /
  ``k8s.<kind>.available`` (``deployments.go:25-38``,
  ``replicasets.go:24-27``, ``replicationcontrollers.go`` same guard,
  ``replica.go:9-32``);
- daemonset: current_scheduled/desired_scheduled/misscheduled/ready
  nodes (``daemonsets.go:15-45``);
- statefulset: nil-Replicas guard, desired/ready/current/updated pods
  (``statefulsets.go:21-60``);
- job: active/desired_successful/failed/max_parallel/successful pods —
  the reference dereferences ``Spec.Completions``/``Spec.Parallelism``
  unconditionally (``jobs.go:62-95``; the API server defaults both
  to 1), so the input contract here is non-null columns;
- cronjob: ``k8s.cronjob.active_jobs`` = len(Status.Active)
  (``cronjobs.go``);
- hpa: max/min/current/desired replicas (``hpa.go:21-76``);
- resource_quota: per hard/used resource-list entry with the resource
  name as a metric label, ``.cpu``-suffixed resources as millicores
  (``resourcequotas.go:48-80``).

Scale notes: a cluster snapshot is control-plane metadata — O(10^4-10^6)
rows even for huge clusters, never the 100 TB fact side.  Each kind is
built as ONE array-of-structs projection + a single ``explode`` (no
per-metric union branches re-scanning the input), and the interpreted
higher-order functions this uses are fine at dimension scale.  The
output unions are cheap (each branch reads a different snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# utils/kube.go:55 — `^[\w_-]+://`
CONTAINER_ID_SCHEME_RX = r"^[\w_-]+://"

# Binary (Ki..Ti) and decimal (k..T) quantity suffixes, as milli-unit
# multipliers (k8s resource.Quantity integer forms; fractional decimals
# are out of contract — synthesize integers + suffix).
_QTY_MILLI = {
    "m": 1,
    "": 1000,
    "k": 1000 * 1000,
    "M": 1000**2 * 1000,
    "G": 1000**3 * 1000,
    "T": 1000**4 * 1000,
    "Ki": 1024 * 1000,
    "Mi": 1024**2 * 1000,
    "Gi": 1024**3 * 1000,
    "Ti": 1024**4 * 1000,
}


def quantity_milli(col):
    """k8s Quantity string → milli-units (bigint). ``MilliValue()`` analog
    for the integer+suffix subset ("250m", "2", "1Gi", "536870912")."""
    num = F.regexp_extract(col, r"^([0-9]+)", 1).cast("bigint")
    suf = F.regexp_extract(col, r"^[0-9]+(m|Ki|Mi|Gi|Ti|k|M|G|T)?$", 1)
    mult = F.lit(None).cast("bigint")
    expr = None
    for s, m in _QTY_MILLI.items():
        cond = (suf == F.lit(s))
        expr = F.when(cond, F.lit(m)) if expr is None else expr.when(cond, F.lit(m))
    mult = expr.otherwise(F.lit(None).cast("bigint"))
    return num * mult


def quantity_value(col):
    """``Value()`` analog: whole units, fractions rounded UP, as Go's
    Quantity.Value() does for milli-form quantities ("500m" → 1)."""
    milli = quantity_milli(col)
    return F.floor((milli + F.lit(999)) / F.lit(1000)).cast("bigint")


_qty_units = quantity_value


def _m(kind, uid, name, namespace, extra, metric, value):
    """Build one metric struct (all Columns/literals)."""
    return F.struct(
        kind.alias("kind"), uid.alias("uid"), name.alias("name"),
        namespace.alias("namespace"), extra.alias("extra"),
        metric.alias("metric"), value.cast("bigint").alias("value"))


def _ns():
    # built lazily: module-level Column literals need an active
    # SparkContext, and Python workers re-import this module
    return F.lit(None).cast("string")


def _explode(df: DataFrame, arr) -> DataFrame:
    return df.select(F.explode(arr).alias("m")).select("m.*")


# --------------------------------------------------------------------------
# pods + containers (collection/pods.go, containers.go)
# --------------------------------------------------------------------------

# pods.go:43-47
POD_PHASE = {"Pending": 1, "Running": 2, "Succeeded": 3, "Failed": 4,
             "Unknown": 5}


def _phase_value(col):
    expr = None
    for p, v in POD_PHASE.items():
        c = (col == F.lit(p))
        expr = F.when(c, F.lit(v)) if expr is None else expr.when(c, F.lit(v))
    return expr.otherwise(F.lit(5))   # default → 5 (pods.go:46)


def pod_metrics(pods: DataFrame) -> DataFrame:
    """``getMetricsForPod`` (pods.go:49-97): one ``k8s.pod.phase`` row per
    pod plus the per-container battery.

    Input contract: (uid, name, namespace, node, phase,
    containers: array<struct<container_id, name, image, restarts:int,
    ready:boolean, requests:map<string,string>, limits:map<string,string>>>)
    — the joined spec+status view; ``requests``/``limits`` hold k8s
    quantity strings."""
    kind_pod, kind_c = F.lit("pod"), F.lit("container")
    pod = F.col("name")
    ns = F.col("namespace")

    def container_arr(c):
        cid = F.regexp_replace(c["container_id"], CONTAINER_ID_SCHEME_RX, "")
        base = [
            _m(kind_c, cid, pod, ns, c["name"],
               F.lit("k8s.container.restarts"), c["restarts"]),
            _m(kind_c, cid, pod, ns, c["name"],
               F.lit("k8s.container.ready"),
               F.when(c["ready"], F.lit(1)).otherwise(F.lit(0))),
        ]

        def rl(mp, typ):
            return F.transform(
                F.map_entries(mp),
                lambda e: _m(
                    kind_c, cid, pod, ns, c["name"],
                    F.concat(F.lit("k8s.container."), e["key"], F.lit("_" + typ)),
                    F.when(e["key"] == F.lit("cpu"),
                           quantity_milli(e["value"]))
                    .otherwise(_qty_units(e["value"]))))

        return F.concat(F.array(*base), rl(c["requests"], "request"),
                        rl(c["limits"], "limit"))

    live = F.filter(F.col("containers"),
                    lambda c: c["container_id"] != F.lit(""))   # pods.go:64-66
    arr = F.concat(
        F.array(_m(kind_pod, F.col("uid"), pod, ns, F.col("node"),
                   F.lit("k8s.pod.phase"), _phase_value(F.col("phase")))),
        F.flatten(F.transform(live, container_arr)))
    return _explode(pods, arr)


# --------------------------------------------------------------------------
# nodes (collection/nodes.go)
# --------------------------------------------------------------------------

def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i > 0:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def node_metrics(nodes: DataFrame,
                 conditions: tuple[str, ...] = ("Ready",)) -> DataFrame:
    """``getMetricsForNode`` (nodes.go:19-41): one
    ``k8s.node.condition_<snake>`` gauge per configured condition type;
    True→1 False→0 Unknown/missing→-1 (nodes.go:57-71).

    Input: (uid, name, conditions: map<string,string>)."""
    kind = F.lit("node")
    mets = []
    for ct in conditions:
        status = F.col("conditions").getItem(ct)
        val = (F.when(status == "True", F.lit(1))
               .when(status == "False", F.lit(0))
               .otherwise(F.lit(-1)))
        mets.append(_m(kind, F.col("uid"), F.col("name"), _ns(), _ns(),
                       F.lit("k8s.node.condition_" + _snake(ct)), val))
    return _explode(nodes, F.array(*mets))


# --------------------------------------------------------------------------
# namespaces (collection/namespaces.go)
# --------------------------------------------------------------------------

def namespace_metrics(ns: DataFrame) -> DataFrame:
    """namespaces.go:44-49: Active→1 Terminating→0 blank→-1, any other
    phase string → 0 (Go map zero value). Input: (uid, name, phase)."""
    val = (F.when(F.col("phase") == "Active", F.lit(1))
           .when(F.col("phase") == "Terminating", F.lit(0))
           .when(F.col("phase") == "", F.lit(-1))
           .otherwise(F.lit(0)))
    return _explode(ns, F.array(
        _m(F.lit("namespace"), F.col("uid"), F.col("name"), _ns(), _ns(),
           F.lit("k8s.namespace.phase"), val)))


# --------------------------------------------------------------------------
# replica-shaped workloads (collection/replica.go + guards)
# --------------------------------------------------------------------------

def replica_metrics(df: DataFrame, kind: str) -> DataFrame:
    """deployments / replicasets / replication_controllers
    (``getReplicaMetrics`` replica.go:9-32; nil-Replicas objects emit
    nothing, deployments.go:25-27).  Input: (uid, name, namespace,
    desired: int nullable, available: int)."""
    k = F.lit(kind)
    out = df.filter(F.col("desired").isNotNull())
    return _explode(out, F.array(
        _m(k, F.col("uid"), F.col("name"), F.col("namespace"), _ns(),
           F.lit(f"k8s.{kind}.desired"), F.col("desired")),
        _m(k, F.col("uid"), F.col("name"), F.col("namespace"), _ns(),
           F.lit(f"k8s.{kind}.available"), F.col("available"))))


def daemonset_metrics(ds: DataFrame) -> DataFrame:
    """daemonsets.go:15-68. Input: (uid, name, namespace,
    current_scheduled, desired_scheduled, misscheduled, ready)."""
    k = F.lit("daemonset")
    u, n, s = F.col("uid"), F.col("name"), F.col("namespace")
    return _explode(ds, F.array(
        _m(k, u, n, s, _ns(), F.lit("k8s.daemonset.current_scheduled_nodes"),
           F.col("current_scheduled")),
        _m(k, u, n, s, _ns(), F.lit("k8s.daemonset.desired_scheduled_nodes"),
           F.col("desired_scheduled")),
        _m(k, u, n, s, _ns(), F.lit("k8s.daemonset.misscheduled_nodes"),
           F.col("misscheduled")),
        _m(k, u, n, s, _ns(), F.lit("k8s.daemonset.ready_nodes"),
           F.col("ready"))))


def statefulset_metrics(ss: DataFrame) -> DataFrame:
    """statefulsets.go:37-60 (nil-Replicas guard at :38-40).
    Input: (uid, name, namespace, desired nullable, ready, current,
    updated)."""
    k = F.lit("statefulset")
    u, n, s = F.col("uid"), F.col("name"), F.col("namespace")
    out = ss.filter(F.col("desired").isNotNull())
    return _explode(out, F.array(
        _m(k, u, n, s, _ns(), F.lit("k8s.statefulset.desired_pods"),
           F.col("desired")),
        _m(k, u, n, s, _ns(), F.lit("k8s.statefulset.ready_pods"),
           F.col("ready")),
        _m(k, u, n, s, _ns(), F.lit("k8s.statefulset.current_pods"),
           F.col("current")),
        _m(k, u, n, s, _ns(), F.lit("k8s.statefulset.updated_pods"),
           F.col("updated"))))


def job_metrics(jobs: DataFrame) -> DataFrame:
    """jobs.go:62-95. Input: (uid, name, namespace, active, failed,
    succeeded, completions, parallelism) — completions/parallelism
    non-null per the API-server defaulting the reference relies on."""
    k = F.lit("job")
    u, n, s = F.col("uid"), F.col("name"), F.col("namespace")
    return _explode(jobs, F.array(
        _m(k, u, n, s, _ns(), F.lit("k8s.job.active_pods"), F.col("active")),
        _m(k, u, n, s, _ns(), F.lit("k8s.job.desired_successful_pods"),
           F.col("completions")),
        _m(k, u, n, s, _ns(), F.lit("k8s.job.failed_pods"), F.col("failed")),
        _m(k, u, n, s, _ns(), F.lit("k8s.job.max_parallel_pods"),
           F.col("parallelism")),
        _m(k, u, n, s, _ns(), F.lit("k8s.job.successful_pods"),
           F.col("succeeded"))))


def cronjob_metrics(cj: DataFrame) -> DataFrame:
    """cronjobs.go: active_jobs = len(Status.Active).
    Input: (uid, name, namespace, active_count)."""
    return _explode(cj, F.array(
        _m(F.lit("cronjob"), F.col("uid"), F.col("name"),
           F.col("namespace"), _ns(), F.lit("k8s.cronjob.active_jobs"),
           F.col("active_count"))))


def hpa_metrics(hpa: DataFrame) -> DataFrame:
    """hpa.go:50-76. Input: (uid, name, namespace, max_replicas,
    min_replicas, current_replicas, desired_replicas)."""
    k = F.lit("hpa")
    u, n, s = F.col("uid"), F.col("name"), F.col("namespace")
    return _explode(hpa, F.array(
        _m(k, u, n, s, _ns(), F.lit("k8s.hpa.max_replicas"),
           F.col("max_replicas")),
        _m(k, u, n, s, _ns(), F.lit("k8s.hpa.min_replicas"),
           F.col("min_replicas")),
        _m(k, u, n, s, _ns(), F.lit("k8s.hpa.current_replicas"),
           F.col("current_replicas")),
        _m(k, u, n, s, _ns(), F.lit("k8s.hpa.desired_replicas"),
           F.col("desired_replicas"))))


def quota_metrics(rq: DataFrame) -> DataFrame:
    """resourcequotas.go:48-80: per hard/used entry one gauge with the
    resource name as the ``resource`` label (→ ``extra``); resources
    suffixed ``.cpu`` (and bare ``cpu``) in millicores.
    Input: (uid, name, namespace, hard: map<string,string>,
    used: map<string,string>)."""
    k = F.lit("resource_quota")
    u, n, s = F.col("uid"), F.col("name"), F.col("namespace")

    def rl(mp, metric):
        return F.transform(
            F.map_entries(mp),
            lambda e: _m(
                k, u, n, s, e["key"], F.lit(metric),
                F.when((e["key"] == F.lit("cpu"))
                       | e["key"].endswith(".cpu"),
                       quantity_milli(e["value"]))
                .otherwise(_qty_units(e["value"]))))

    arr = F.concat(rl(F.col("hard"), "k8s.resource_quota.hard_limit"),
                   rl(F.col("used"), "k8s.resource_quota.used"))
    return _explode(rq, arr)


# --------------------------------------------------------------------------
# the receiver: union of whatever snapshots are present
# --------------------------------------------------------------------------

def cluster_metrics(pods: DataFrame | None = None,
                    nodes: DataFrame | None = None,
                    node_conditions: tuple[str, ...] = ("Ready",),
                    namespaces: DataFrame | None = None,
                    deployments: DataFrame | None = None,
                    replicasets: DataFrame | None = None,
                    replication_controllers: DataFrame | None = None,
                    daemonsets: DataFrame | None = None,
                    statefulsets: DataFrame | None = None,
                    jobs: DataFrame | None = None,
                    cronjobs: DataFrame | None = None,
                    hpas: DataFrame | None = None,
                    quotas: DataFrame | None = None) -> DataFrame:
    """``DataCollector.SyncMetrics`` (collection/collector.go): dispatch
    every watched object kind to its collector and pool the results.
    Kinds whose snapshot is absent contribute nothing (the receiver only
    watches what it is configured for)."""
    parts = []
    if pods is not None:
        parts.append(pod_metrics(pods))
    if nodes is not None:
        parts.append(node_metrics(nodes, node_conditions))
    if namespaces is not None:
        parts.append(namespace_metrics(namespaces))
    for df, kind in ((deployments, "deployment"),
                     (replicasets, "replicaset"),
                     (replication_controllers, "replication_controller")):
        if df is not None:
            parts.append(replica_metrics(df, kind))
    if daemonsets is not None:
        parts.append(daemonset_metrics(daemonsets))
    if statefulsets is not None:
        parts.append(statefulset_metrics(statefulsets))
    if jobs is not None:
        parts.append(job_metrics(jobs))
    if cronjobs is not None:
        parts.append(cronjob_metrics(cronjobs))
    if hpas is not None:
        parts.append(hpa_metrics(hpas))
    if quotas is not None:
        parts.append(quota_metrics(quotas))
    if not parts:
        raise ValueError("cluster_metrics: no snapshots provided")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
