"""Broadcast lookup enrichment — the k8sprocessor analog.

Reference semantics:
- join key extraction: pod IP from attributes ``k8s.pod.ip`` then ``ip``,
  else host.name-if-IP, else connection peer
  (processor/k8sprocessor/ip_extractor.go:28-49, processor.go:101-141);
- probe a small in-memory map[ip]*Pod (kube/client.go:172-184) — i.e. a
  broadcast hash equi-join, the only join shape in the reference;
- attributes are added with InsertString = insert-if-absent — an
  existing event attribute always wins (processor.go:137-140);
- lookup miss -> row passes through unenriched (processor.go:132-135);
- ignored pods never enrich (client.go:304-329) — filtered off the
  dimension *before* broadcast (the server-side-selector pushdown
  analog, kube/client.go:331-357);
- dimension-side extraction: deployment name via regex
  ``^(.*)-[0-9a-zA-Z]*-[0-9a-zA-Z]*$`` on pod name (client.go:55),
  label sub-extraction with a single capture group (client.go:241-253).

Scale notes: the dimension is O(pods) ≈ 10^4-10^5 rows — always
broadcast (``F.broadcast``), so enrichment adds ZERO shuffle to the
100 TB fact scan.  All dimension-side regex work happens once, on the
tiny side, before broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEPLOYMENT_RX = r"^(.*)-[0-9a-zA-Z]*-[0-9a-zA-Z]*$"   # kube/client.go:55
GIT_SHA_RX = r"GIT_SHA=(\w+)"                          # k8sprocessor/config.go:88-99 style


def prepare_pods_dim(pods: DataFrame) -> DataFrame:
    """Precompute enrichment columns on the dimension side (client.go:186-239)
    and drop ignored pods (client.go:304-329).

    Same-IP conflicts resolve to the NEWEST StartTime (client.go:278-283:
    a recreated pod reuses the IP; the newest owner wins), tie-broken by
    pod_name for determinism.  Without this, duplicate pod_ip rows in
    the dimension would fan out fact rows in the broadcast join."""
    from pyspark.sql import Window
    w = Window.partitionBy("pod_ip").orderBy(
        F.col("start_time").desc(), F.col("pod_name").asc())
    return (pods
            .filter(~F.col("ignore"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .withColumn("deployment",
                        F.regexp_extract(F.col("pod_name"), DEPLOYMENT_RX, 1))
            .withColumn("git_sha",
                        F.regexp_extract(F.col("labels_raw"), GIT_SHA_RX, 1))
            .select("pod_ip", "pod_name", "namespace", "node_name",
                    "start_time", "deployment", "git_sha"))


def broadcast_enrich(events: DataFrame, dim: DataFrame, key: str,
                     attrs: list[str] | None = None,
                     mode: str = "insert") -> DataFrame:
    """Left broadcast-hash join; attribute merge per reference rules.

    mode='insert'  — insert-if-absent: pre-existing event column wins
                     (k8sprocessor processor.go:137-140; resourcedetection
                     Insert, internal/resourcedetection.go:176-183).
    mode='upsert'  — looked-up value wins when present
                     (resourcedetection Upsert, resourcedetection.go:184-189;
                     groupbyattrs record-over-resource precedence,
                     attribute_groups.go:155-159).
    """
    attrs = attrs or [c for c in dim.columns if c != key]
    dim_sel = dim.select(key, *[F.col(a).alias(f"__dim_{a}") for a in attrs])
    out = events.join(F.broadcast(dim_sel), on=key, how="left")
    for a in attrs:
        dim_col = F.col(f"__dim_{a}")
        if a in events.columns:
            merged = (F.coalesce(F.col(a), dim_col) if mode == "insert"
                      else F.coalesce(dim_col, F.col(a)))
        else:
            merged = dim_col
        out = out.withColumn(a, merged).drop(f"__dim_{a}")
    return out
