"""Driver-contract query for the k8sclusterreceiver analog.

The cluster snapshot (pods + containers, nodes, namespaces, workloads,
quotas) is synthesized deterministically from ``pods.parquet`` — every
derived field is a pure function of md5 prefixes of the pod/node/
namespace names, so the DuckDB oracle reproduces the *inputs* from the
same base table and derives the *expected metric values* from first
principles (quantity strings map straight to their expected numeric
values by synthesis index — the oracle never re-parses a quantity, so
the Spark-side parser in ``operators/k8scluster.py`` is independently
checked).

Rules exercised (see operators/k8scluster.py for reference cites):
- pod phase 1-5 incl. the unknown-string default (pods.go:43-47);
- empty-ContainerID containers skipped entirely (pods.go:64-66,74-83);
- container.id scheme strip (utils/kube.go:55-60);
- CPU as millicores vs memory as rounded-up units (containers.go:
  88-131), binary/decimal/plain quantity forms;
- node conditions True/False/Unknown→1/0/-1 with a configured type that
  is sometimes or never present in the map (nodes.go:57-71);
- namespace phase Active/Terminating/blank/other → 1/0/-1/0
  (namespaces.go:44-49);
- nil-Spec.Replicas deployments/replicasets/statefulsets emit nothing
  (deployments.go:25-27, replicasets.go:24-27, statefulsets.go:38-40);
- job / cronjob / hpa / daemonset batteries (jobs.go:62-95, cronjobs.go,
  hpa.go:50-76, daemonsets.go:15-68);
- resource-quota per-entry gauges with the ``resource`` label and the
  ``.cpu``-suffix millicore rule (resourcequotas.go:48-80).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.enrich import DEPLOYMENT_RX
from .operators.k8scluster import cluster_metrics

# synthesis tables: quantity string by index, and the expected numeric
# value the reference would emit for it (cpu → millicores, others →
# rounded-up whole units)
PHASES = ["Pending", "Running", "Succeeded", "Failed", "Unknown", "Bogus"]
PHASE_VAL = [1, 2, 3, 4, 5, 5]
CPU_REQ = ["250m", "500m", "1", "2"]
CPU_REQ_V = [250, 500, 1000, 2000]
MEM_REQ = ["128Mi", "512Mi", "1Gi", "536870912"]
MEM_REQ_V = [134217728, 536870912, 1073741824, 536870912]
CPU_LIM = ["1", "2", "4", "500m"]
CPU_LIM_V = [1000, 2000, 4000, 500]
MEM_LIM = ["1Gi", "2147483648", "256Mi", "4Gi"]
MEM_LIM_V = [1073741824, 2147483648, 268435456, 4294967296]
SC_CPU = ["100m", "1500m"]
SC_CPU_V = [100, 1500]
NS_PHASE = ["Active", "Terminating", "", "Rogue"]
NS_PHASE_V = [1, 0, -1, 0]
Q_CPU_USED = ["500m", "1500m", "1", "3"]
Q_CPU_USED_V = [500, 1500, 1000, 3000]
Q_MEM_USED = ["1Gi", "2048Mi", "536870912", "3Gi"]
Q_MEM_USED_V = [1073741824, 2147483648, 536870912, 3221225472]

NODE_CONDITIONS = ("Ready", "MemoryPressure", "DiskPressure")


def _h(col):
    """6-hex-digit md5 prefix as bigint (same derivation in the oracle)."""
    return F.conv(F.substring(F.md5(col), 1, 6), 16, 10).cast("bigint")


def _pick(lst, idx):
    return F.element_at(F.array(*[F.lit(x) for x in lst]),
                        (idx + 1).cast("int"))


def q_k8s_cluster(spark: SparkSession, sf_dir: str, tok_dir: str) -> DataFrame:
    pods_raw = spark.read.parquet(os.path.join(tok_dir, "pods.parquet"))
    h = _h(F.col("pod_name"))
    h2 = _h(F.concat(F.col("pod_name"), F.lit("#2")))
    # 11 object-kind batteries below all derive from this one snapshot;
    # persist so the union does not re-scan pods.parquet per branch
    # (pods is a small dimension — O(cluster size) — even at 100 TB)
    from pyspark import StorageLevel
    base = pods_raw.select(
        "pod_name", "namespace", "node_name", h.alias("h"), h2.alias("h2"),
        _pick(PHASES, h % 6).alias("phase")).persist(
            StorageLevel.MEMORY_AND_DISK)

    hc, hc2 = F.col("h"), F.col("h2")
    app = F.struct(
        F.concat(F.lit("docker://"),
                 F.md5(F.concat("pod_name", F.lit("/app")))).alias("container_id"),
        F.lit("app").alias("name"), F.lit("img:app").alias("image"),
        (hc % 6).cast("int").alias("restarts"),
        ((hc % 3) != 0).alias("ready"),
        F.create_map(
            F.lit("cpu"), _pick(CPU_REQ, hc % 4),
            F.lit("memory"), _pick(MEM_REQ, hc2 % 4)).alias("requests"),
        F.create_map(
            F.lit("cpu"), _pick(CPU_LIM, hc2 % 4),
            F.lit("memory"), _pick(MEM_LIM, hc % 4)).alias("limits"))
    sidecar = F.struct(
        F.when(hc % 5 == 0, F.lit(""))        # empty ID → skipped entirely
        .otherwise(F.concat(F.lit("containerd://"),
                            F.md5(F.concat("pod_name", F.lit("/sidecar")))))
        .alias("container_id"),
        F.lit("sidecar").alias("name"), F.lit("img:sc").alias("image"),
        (hc2 % 4).cast("int").alias("restarts"),
        ((hc2 % 2) == 0).alias("ready"),
        F.create_map(F.lit("cpu"), _pick(SC_CPU, hc2 % 2)).alias("requests"),
        F.expr("cast(map() as map<string,string>)").alias("limits"))
    pods_snap = base.select(
        F.md5("pod_name").alias("uid"), F.col("pod_name").alias("name"),
        "namespace", F.col("node_name").alias("node"), "phase",
        F.array(app, sidecar).alias("containers"))

    hn = _h(F.col("node_name"))
    nodes_snap = base.select("node_name").distinct().select(
        F.md5("node_name").alias("uid"), F.col("node_name").alias("name"),
        F.map_filter(
            F.create_map(
                F.lit("Ready"), _pick(["True", "False", "Unknown"], hn % 3),
                F.lit("MemoryPressure"),
                F.when(hn % 2 == 0,
                       F.when(hn % 4 == 0, F.lit("True"))
                       .otherwise(F.lit("False")))
                .otherwise(F.lit("__absent__"))),
            lambda k, v: v != F.lit("__absent__")).alias("conditions"))

    hs = _h(F.col("namespace"))
    nsd = base.select("namespace").distinct().select(
        "namespace", hs.alias("hs"))
    hsc = F.col("hs")
    ns_snap = nsd.select(
        F.md5("namespace").alias("uid"), F.col("namespace").alias("name"),
        _pick(NS_PHASE, hsc % 4).alias("phase"))

    dep = (base
           .withColumn("deployment",
                       F.regexp_extract("pod_name", DEPLOYMENT_RX, 1))
           .groupBy("namespace", "deployment")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.sum(F.when(F.col("phase") == "Running", 1)
                      .otherwise(0)).alias("avail"),
                F.sum(F.when(F.col("phase").isin("Running", "Succeeded"), 1)
                      .otherwise(0)).alias("avail2")))
    hd = _h(F.concat("namespace", F.lit("|"), "deployment"))
    dep = dep.withColumn("hd", hd)
    hdc = F.col("hd")
    deployments_snap = dep.select(
        F.md5(F.concat("namespace", F.lit("|"), "deployment")).alias("uid"),
        F.col("deployment").alias("name"), "namespace",
        F.when(hdc % 5 == 0, F.lit(None))
        .otherwise(F.col("cnt")).cast("int").alias("desired"),
        F.col("avail").cast("int").alias("available"))
    replicasets_snap = dep.select(
        F.md5(F.concat("namespace", F.lit("|"), "deployment", F.lit("|rs")))
        .alias("uid"),
        F.concat("deployment", F.lit("-rs")).alias("name"), "namespace",
        F.when(hdc % 7 == 0, F.lit(None))
        .otherwise(F.col("cnt")).cast("int").alias("desired"),
        F.col("avail2").cast("int").alias("available"))

    def single(name_suffix, cols):
        return nsd.select(
            F.md5(F.concat("namespace", F.lit("|" + name_suffix))).alias("uid"),
            F.concat("namespace", F.lit("-" + name_suffix)).alias("name"),
            "namespace", *cols)

    jobs_snap = single("job", [
        (hsc % 5).cast("int").alias("active"),
        (hsc % 3).cast("int").alias("failed"),
        (hsc % 7).cast("int").alias("succeeded"),
        (hsc % 4 + 1).cast("int").alias("completions"),
        (hsc % 2 + 1).cast("int").alias("parallelism")])
    ss_snap = single("ss", [
        F.when(hsc % 3 == 0, F.lit(None))
        .otherwise(hsc % 6 + 1).cast("int").alias("desired"),
        (hsc % 4).cast("int").alias("ready"),
        (hsc % 5).cast("int").alias("current"),
        (hsc % 2).cast("int").alias("updated")])
    ds_snap = single("ds", [
        (hsc % 7).cast("int").alias("current_scheduled"),
        (hsc % 7 + 1).cast("int").alias("desired_scheduled"),
        (hsc % 2).cast("int").alias("misscheduled"),
        (hsc % 5).cast("int").alias("ready")])
    cj_snap = single("cj", [(hsc % 4).cast("int").alias("active_count")])
    hpa_snap = single("hpa", [
        (hsc % 8 + 2).cast("int").alias("max_replicas"),
        (hsc % 2 + 1).cast("int").alias("min_replicas"),
        (hsc % 6).cast("int").alias("current_replicas"),
        (hsc % 5).cast("int").alias("desired_replicas")])
    quota_snap = single("quota", [
        F.create_map(
            F.lit("requests.cpu"), F.lit("2"),
            F.lit("requests.memory"), F.lit("4Gi"),
            F.lit("pods"), F.lit("10")).alias("hard"),
        F.create_map(
            F.lit("requests.cpu"), _pick(Q_CPU_USED, hsc % 4),
            F.lit("requests.memory"), _pick(Q_MEM_USED, hsc % 4),
            F.lit("pods"), (hsc % 10).cast("string")).alias("used")])

    return cluster_metrics(
        pods=pods_snap, nodes=nodes_snap, node_conditions=NODE_CONDITIONS,
        namespaces=ns_snap, deployments=deployments_snap,
        replicasets=replicasets_snap, daemonsets=ds_snap,
        statefulsets=ss_snap, jobs=jobs_snap, cronjobs=cj_snap,
        hpas=hpa_snap, quotas=quota_snap)


# ---------------------------------------------------------------------------
# oracle
# ---------------------------------------------------------------------------

def _sql_list(vals) -> str:
    return "[" + ", ".join(str(v) for v in vals) + "]"


def _sql_slist(vals) -> str:
    return "[" + ", ".join("'" + v + "'" for v in vals) + "]"


def _k8s_oracle(d: str) -> str:
    hexp = "CAST(('0x' || substr(md5({0}),1,6)) AS BIGINT)"

    def pod_row(kind, uid, name, ns, extra, metric, value, where=""):
        return (f"SELECT {kind} AS kind, {uid} AS uid, {name} AS name, "
                f"{ns} AS namespace, {extra} AS extra, {metric} AS metric, "
                f"CAST({value} AS BIGINT) AS value FROM p{where}")

    NUL = "CAST(NULL AS VARCHAR)"

    def idx(col, m):
        return f"CAST({col}%{m} AS INT)+1"

    parts = [
        # pod phase
        pod_row("'pod'", "md5(pod_name)", "pod_name", "namespace",
                "node_name", "'k8s.pod.phase'",
                f"({_sql_list(PHASE_VAL)})[{idx('h', 6)}]"),
        # app container: status + spec battery
        pod_row("'container'", "md5(pod_name || '/app')", "pod_name",
                "namespace", "'app'", "'k8s.container.restarts'", "h%6"),
        pod_row("'container'", "md5(pod_name || '/app')", "pod_name",
                "namespace", "'app'", "'k8s.container.ready'",
                "CASE WHEN h%3<>0 THEN 1 ELSE 0 END"),
        pod_row("'container'", "md5(pod_name || '/app')", "pod_name",
                "namespace", "'app'", "'k8s.container.cpu_request'",
                f"({_sql_list(CPU_REQ_V)})[{idx('h', 4)}]"),
        pod_row("'container'", "md5(pod_name || '/app')", "pod_name",
                "namespace", "'app'", "'k8s.container.memory_request'",
                f"({_sql_list(MEM_REQ_V)})[{idx('h2', 4)}]"),
        pod_row("'container'", "md5(pod_name || '/app')", "pod_name",
                "namespace", "'app'", "'k8s.container.cpu_limit'",
                f"({_sql_list(CPU_LIM_V)})[{idx('h2', 4)}]"),
        pod_row("'container'", "md5(pod_name || '/app')", "pod_name",
                "namespace", "'app'", "'k8s.container.memory_limit'",
                f"({_sql_list(MEM_LIM_V)})[{idx('h', 4)}]"),
        # sidecar (skipped entirely when h%5=0: empty ContainerID)
        pod_row("'container'", "md5(pod_name || '/sidecar')", "pod_name",
                "namespace", "'sidecar'", "'k8s.container.restarts'",
                "h2%4", " WHERE h%5<>0"),
        pod_row("'container'", "md5(pod_name || '/sidecar')", "pod_name",
                "namespace", "'sidecar'", "'k8s.container.ready'",
                "CASE WHEN h2%2=0 THEN 1 ELSE 0 END", " WHERE h%5<>0"),
        pod_row("'container'", "md5(pod_name || '/sidecar')", "pod_name",
                "namespace", "'sidecar'", "'k8s.container.cpu_request'",
                f"({_sql_list(SC_CPU_V)})[{idx('h2', 2)}]", " WHERE h%5<>0"),
    ]

    # nodes
    node_vals = {
        "ready": f"([1,0,-1])[{idx('hn', 3)}]",
        "memory_pressure": ("CASE WHEN hn%2=0 THEN "
                            "(CASE WHEN hn%4=0 THEN 1 ELSE 0 END) "
                            "ELSE -1 END"),
        "disk_pressure": "-1",
    }
    for snake, val in node_vals.items():
        parts.append(
            f"SELECT 'node', md5(node_name), node_name, {NUL}, {NUL}, "
            f"'k8s.node.condition_{snake}', CAST({val} AS BIGINT) FROM nodes")

    # namespaces
    parts.append(
        f"SELECT 'namespace', md5(namespace), namespace, {NUL}, {NUL}, "
        f"'k8s.namespace.phase', "
        f"CAST(({_sql_list(NS_PHASE_V)})[{idx('hs', 4)}] AS BIGINT) FROM nsd")

    # deployments / replicasets (nil-Replicas skip)
    for metric, val, where in (
            ("k8s.deployment.desired", "cnt", "hd%5<>0"),
            ("k8s.deployment.available", "avail", "hd%5<>0")):
        parts.append(
            f"SELECT 'deployment', md5(namespace||'|'||deployment), "
            f"deployment, namespace, {NUL}, '{metric}', "
            f"CAST({val} AS BIGINT) FROM dep WHERE {where}")
    for metric, val, where in (
            ("k8s.replicaset.desired", "cnt", "hd%7<>0"),
            ("k8s.replicaset.available", "avail2", "hd%7<>0")):
        parts.append(
            f"SELECT 'replicaset', md5(namespace||'|'||deployment||'|rs'), "
            f"deployment||'-rs', namespace, {NUL}, '{metric}', "
            f"CAST({val} AS BIGINT) FROM dep WHERE {where}")

    def ns_single(kind, suffix, rows, where=""):
        for metric, val in rows:
            parts.append(
                f"SELECT '{kind}', md5(namespace||'|{suffix}'), "
                f"namespace||'-{suffix}', namespace, {NUL}, '{metric}', "
                f"CAST({val} AS BIGINT) FROM nsd{where}")

    ns_single("job", "job", [
        ("k8s.job.active_pods", "hs%5"),
        ("k8s.job.desired_successful_pods", "hs%4+1"),
        ("k8s.job.failed_pods", "hs%3"),
        ("k8s.job.max_parallel_pods", "hs%2+1"),
        ("k8s.job.successful_pods", "hs%7")])
    ns_single("statefulset", "ss", [
        ("k8s.statefulset.desired_pods", "hs%6+1"),
        ("k8s.statefulset.ready_pods", "hs%4"),
        ("k8s.statefulset.current_pods", "hs%5"),
        ("k8s.statefulset.updated_pods", "hs%2")], " WHERE hs%3<>0")
    ns_single("daemonset", "ds", [
        ("k8s.daemonset.current_scheduled_nodes", "hs%7"),
        ("k8s.daemonset.desired_scheduled_nodes", "hs%7+1"),
        ("k8s.daemonset.misscheduled_nodes", "hs%2"),
        ("k8s.daemonset.ready_nodes", "hs%5")])
    ns_single("cronjob", "cj", [("k8s.cronjob.active_jobs", "hs%4")])
    ns_single("hpa", "hpa", [
        ("k8s.hpa.max_replicas", "hs%8+2"),
        ("k8s.hpa.min_replicas", "hs%2+1"),
        ("k8s.hpa.current_replicas", "hs%6"),
        ("k8s.hpa.desired_replicas", "hs%5")])
    # resource quota: hard fixed, used by index; .cpu entries in milli
    quota_rows = [
        ("k8s.resource_quota.hard_limit", "'requests.cpu'", "2000"),
        ("k8s.resource_quota.hard_limit", "'requests.memory'", "4294967296"),
        ("k8s.resource_quota.hard_limit", "'pods'", "10"),
        ("k8s.resource_quota.used", "'requests.cpu'",
         f"({_sql_list(Q_CPU_USED_V)})[{idx('hs', 4)}]"),
        ("k8s.resource_quota.used", "'requests.memory'",
         f"({_sql_list(Q_MEM_USED_V)})[{idx('hs', 4)}]"),
        ("k8s.resource_quota.used", "'pods'", "hs%10"),
    ]
    for metric, res, val in quota_rows:
        parts.append(
            f"SELECT 'resource_quota', md5(namespace||'|quota'), "
            f"namespace||'-quota', namespace, {res}, '{metric}', "
            f"CAST({val} AS BIGINT) FROM nsd")

    body = "\nUNION ALL\n".join(parts)
    return f"""WITH pods0 AS (
  SELECT pod_name, namespace, node_name,
         {hexp.format('pod_name')} AS h,
         {hexp.format("pod_name || '#2'")} AS h2
  FROM read_parquet('{d}/pods.parquet')
), p AS (
  SELECT *, ({_sql_slist(PHASES)})[CAST(h%6 AS INT)+1] AS phase FROM pods0
), nodes AS (
  SELECT node_name, {hexp.format('node_name')} AS hn
  FROM (SELECT DISTINCT node_name FROM pods0)
), nsd AS (
  SELECT namespace, {hexp.format('namespace')} AS hs
  FROM (SELECT DISTINCT namespace FROM pods0)
), dep0 AS (
  SELECT namespace,
         regexp_extract(pod_name,
                        '^(.*)-[0-9a-zA-Z]*-[0-9a-zA-Z]*$', 1) AS deployment,
         count(*) AS cnt,
         sum(CASE WHEN phase='Running' THEN 1 ELSE 0 END) AS avail,
         sum(CASE WHEN phase IN ('Running','Succeeded') THEN 1 ELSE 0 END)
             AS avail2
  FROM p GROUP BY 1, 2
), dep AS (
  SELECT *, {hexp.format("namespace||'|'||deployment")} AS hd FROM dep0
)
{body}"""


def k8s_queries() -> dict:
    return {"k8s_cluster": q_k8s_cluster}


def k8s_oracles(d: str) -> dict:
    return {"k8s_cluster": _k8s_oracle(d)}
