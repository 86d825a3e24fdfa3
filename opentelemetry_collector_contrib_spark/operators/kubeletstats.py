"""kubeletstatsreceiver re-expressed as a batch JSON translator.

The reference polls each kubelet's ``/stats/summary`` endpoint and
accumulates node / pod / container / volume metric groups
(receiver/kubeletstatsreceiver/kubelet/accumulator.go:60-158,
metrics.go MetricsData walk):

- node:      cpu + fs + memory + network metrics, ``k8s.node.`` prefix
- pod:       cpu + ephemeral-storage(fs) + memory + network,
             ``k8s.pod.`` prefix
- container: cpu + memory + rootfs(fs), ``container.`` prefix
- volume:    5 inode/byte gauges per pod volume, ``k8s.volume.`` prefix

Per-family builders (cpu.go / mem.go / fs.go / network.go / volume.go):
cpu.utilization = usageNanoCores/1e9 (double gauge), cpu.time =
usageCoreNanoSeconds/1e9 (cumulative double); six memory int gauges;
three filesystem int gauges; network.io / network.errors cumulative
ints labelled (interface, direction); nil source fields emit no metric.
``metric_groups`` mirrors the metricGroupsToCollect config filter
(config.go).

Batch shape: one summary JSON per (node scrape); ``from_json`` decodes
JVM-side, pods/containers/volumes are nested explodes (narrow), and the
metric battery is an array-of-structs explode — no Python hop, no
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_CPU = T.StructType([
    T.StructField("usageNanoCores", T.LongType()),
    T.StructField("usageCoreNanoSeconds", T.LongType()),
])
_MEM = T.StructType([
    T.StructField("availableBytes", T.LongType()),
    T.StructField("usageBytes", T.LongType()),
    T.StructField("rssBytes", T.LongType()),
    T.StructField("workingSetBytes", T.LongType()),
    T.StructField("pageFaults", T.LongType()),
    T.StructField("majorPageFaults", T.LongType()),
])
_FS = T.StructType([
    T.StructField("availableBytes", T.LongType()),
    T.StructField("capacityBytes", T.LongType()),
    T.StructField("usedBytes", T.LongType()),
])
_NET = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("rxBytes", T.LongType()),
    T.StructField("txBytes", T.LongType()),
    T.StructField("rxErrors", T.LongType()),
    T.StructField("txErrors", T.LongType()),
])

SUMMARY_SCHEMA = T.StructType([
    T.StructField("node", T.StructType([
        T.StructField("nodeName", T.StringType()),
        T.StructField("cpu", _CPU),
        T.StructField("memory", _MEM),
        T.StructField("fs", _FS),
        T.StructField("network", _NET),
    ])),
    T.StructField("pods", T.ArrayType(T.StructType([
        T.StructField("podRef", T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("namespace", T.StringType()),
            T.StructField("uid", T.StringType()),
        ])),
        T.StructField("cpu", _CPU),
        T.StructField("memory", _MEM),
        T.StructField("ephemeral-storage", _FS),
        T.StructField("network", _NET),
        T.StructField("containers", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("cpu", _CPU),
            T.StructField("memory", _MEM),
            T.StructField("rootfs", _FS),
        ]))),
        T.StructField("volume", T.ArrayType(T.StructType([
            T.StructField("name", T.StringType()),
            T.StructField("availableBytes", T.LongType()),
            T.StructField("capacityBytes", T.LongType()),
            T.StructField("inodes", T.LongType()),
            T.StructField("inodesFree", T.LongType()),
            T.StructField("inodesUsed", T.LongType()),
        ]))),
    ]))),
])

ALL_GROUPS = ("node", "pod", "container", "volume")

_OUT = ("scrape_id", "grp", "metric_name", "metric_type", "units",
        "node_name", "pod_name", "namespace", "container_name",
        "volume_name", "interface", "direction", "value_i", "value_d")


def _battery(prefix, grp, cpu, mem, fs, net, pod=None, ns=None, cont=None,
             vol=None, with_mem=True, with_fs=True, with_net=True):
    """One array of fully-labelled metric structs per the cpu/mem/fs/
    network builders; nil source fields produce null-valued entries
    filtered after the single explode."""
    NUL_I = F.lit(None).cast("bigint")
    NUL_D = F.lit(None).cast("double")
    NUL_S = F.lit(None).cast("string")

    def m(name, mtype, units, vi=None, vd=None, iface=None, direction=None):
        return F.struct(
            F.lit(grp).alias("grp"),
            F.lit(prefix + name).alias("metric_name"),
            F.lit(mtype).alias("metric_type"), F.lit(units).alias("units"),
            (pod if pod is not None else NUL_S).alias("pod_name"),
            (ns if ns is not None else NUL_S).alias("namespace"),
            (cont if cont is not None else NUL_S).alias("container_name"),
            (vol if vol is not None else NUL_S).alias("volume_name"),
            (iface if iface is not None else NUL_S).alias("interface"),
            (F.lit(direction) if direction is not None else NUL_S)
            .alias("direction"),
            (vi.cast("bigint") if vi is not None else NUL_I)
            .alias("value_i"),
            (vd.cast("double") if vd is not None else NUL_D)
            .alias("value_d"))

    out = [
        # cpu.go: nanocores/1e9 gauge, core-nanoseconds/1e9 cumulative
        m("cpu.utilization", "gauge", "1",
          vd=cpu["usageNanoCores"].cast("double") / F.lit(1e9)),
        m("cpu.time", "cumulative", "s",
          vd=cpu["usageCoreNanoSeconds"].cast("double") / F.lit(1e9)),
    ]
    if with_mem:
        out += [
            m("memory.available", "gauge", "By", vi=mem["availableBytes"]),
            m("memory.usage", "gauge", "By", vi=mem["usageBytes"]),
            m("memory.rss", "gauge", "By", vi=mem["rssBytes"]),
            m("memory.working_set", "gauge", "By",
              vi=mem["workingSetBytes"]),
            m("memory.page_faults", "gauge", "1", vi=mem["pageFaults"]),
            m("memory.major_page_faults", "gauge", "1",
              vi=mem["majorPageFaults"]),
        ]
    if with_fs:
        out += [
            m("filesystem.available", "gauge", "By",
              vi=fs["availableBytes"]),
            m("filesystem.capacity", "gauge", "By", vi=fs["capacityBytes"]),
            m("filesystem.usage", "gauge", "By", vi=fs["usedBytes"]),
        ]
    if with_net:
        out += [
            m("network.io", "cumulative", "By", vi=net["rxBytes"],
              iface=net["name"], direction="receive"),
            m("network.io", "cumulative", "By", vi=net["txBytes"],
              iface=net["name"], direction="transmit"),
            m("network.errors", "cumulative", "1", vi=net["rxErrors"],
              iface=net["name"], direction="receive"),
            m("network.errors", "cumulative", "1", vi=net["txErrors"],
              iface=net["name"], direction="transmit"),
        ]
    return F.array(*out)


def _vol_battery(v, pod, ns):
    NUL_S = F.lit(None).cast("string")
    return F.array(*[
        F.struct(F.lit("volume").alias("grp"),
                 F.lit("k8s.volume." + n).alias("metric_name"),
                 F.lit("gauge").alias("metric_type"),
                 F.lit(u).alias("units"),
                 pod.alias("pod_name"), ns.alias("namespace"),
                 NUL_S.alias("container_name"),
                 v["name"].alias("volume_name"),
                 NUL_S.alias("interface"), NUL_S.alias("direction"),
                 v[fld].cast("bigint").alias("value_i"),
                 F.lit(None).cast("double").alias("value_d"))
        for n, u, fld in [("available", "By", "availableBytes"),
                          ("capacity", "By", "capacityBytes"),
                          ("inodes", "1", "inodes"),
                          ("inodes.free", "1", "inodesFree"),
                          ("inodes.used", "1", "inodesUsed")]])


def parse_kubelet_summary(df: DataFrame, summary_col: str = "summary_json",
                          id_col: str = "scrape_id",
                          metric_groups: tuple = ALL_GROUPS) -> DataFrame:
    """Summary payloads -> the four metric groups, nil fields skipped.

    Single-pass: ONE from_json, all selected groups assembled into one
    combined metric array (nested lambda transforms over the pods
    array), ONE explode.  Null sub-arrays (a pod without containers or
    volumes) are dropped via array_compact before flattening.
    """
    bad = set(metric_groups) - set(ALL_GROUPS)
    if bad:
        raise ValueError(f"invalid metric groups: {bad}")
    s = df.select(F.col(id_col).alias("scrape_id"),
                  F.from_json(F.col(summary_col), SUMMARY_SCHEMA).alias("j"))
    node = F.col("j.node")

    def per_pod(p):
        pod, ns = p["podRef"]["name"], p["podRef"]["namespace"]
        pieces = []
        if "pod" in metric_groups:
            pieces.append(_battery("k8s.pod.", "pod", p["cpu"], p["memory"],
                                   p["ephemeral-storage"], p["network"],
                                   pod=pod, ns=ns))
        if "container" in metric_groups:
            pieces.append(F.flatten(F.transform(
                p["containers"],
                lambda c: _battery("container.", "container", c["cpu"],
                                   c["memory"], c["rootfs"], None, pod=pod,
                                   ns=ns, cont=c["name"], with_net=False))))
        if "volume" in metric_groups:
            pieces.append(F.flatten(F.transform(
                p["volume"], lambda v: _vol_battery(v, pod=pod, ns=ns))))
        return F.flatten(F.array_compact(F.array(*pieces)))

    arrays = []
    if "node" in metric_groups:
        arrays.append(_battery("k8s.node.", "node", node["cpu"],
                               node["memory"], node["fs"], node["network"]))
    if set(metric_groups) - {"node"}:
        arrays.append(F.flatten(F.transform(F.col("j.pods"), per_pod)))
    combined = F.flatten(F.array_compact(F.array(*arrays)))

    out = (s.select("scrape_id", node["nodeName"].alias("node_name"),
                    F.explode(combined).alias("m"))
           .select("scrape_id", "m.grp", "m.metric_name", "m.metric_type",
                   "m.units", "node_name", "m.pod_name", "m.namespace",
                   "m.container_name", "m.volume_name", "m.interface",
                   "m.direction", "m.value_i", "m.value_d"))
    # nil source fields -> no metric (pb.go intGauge/doubleGauge nil guard)
    return out.where(F.col("value_i").isNotNull()
                     | F.col("value_d").isNotNull())
