"""metricstransform (combine / distribution merge / label ops), carbon +
statsd parsers, filters (metadata map, selectors, tail sampling),
partitioners (ring parity vs pure-Python, salting determinism)."""

import zlib

import numpy as np
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.carbon import (
    CarbonRegexRule, apply_regex_rules, parse_plaintext)
from opentelemetry_collector_contrib_spark.operators.filters import (
    SamplingPolicy, dim_selector, map_metadata_filter, tail_sample)
from opentelemetry_collector_contrib_spark.operators.metrics_transform import (
    aggregate_labels, combine, merge_distributions, rename_metric,
    update_label)
from opentelemetry_collector_contrib_spark.operators.partitioners import (
    RING_POSITIONS, build_ring, batch_per_attr, ring_route_column,
    salted_repartition)
from opentelemetry_collector_contrib_spark.operators.statsd import (
    flush_aggregate, parse_statsd)

from conftest import rows


# -- carbon -----------------------------------------------------------------

def test_carbon_plaintext(spark):
    df = spark.createDataFrame(
        [("cpu.usage;host=h1;dc=us 42.5 1598313600",),
         ("mem.rss 7.0 1598313601",)], "line string")
    got = {r["metric_path"]: r for r in parse_plaintext(df).collect()}
    assert got["cpu.usage"]["tags"] == {"host": "h1", "dc": "us"}
    assert got["cpu.usage"]["value"] == 42.5
    assert got["mem.rss"]["tags"] == {}
    assert got["mem.rss"]["ts"] == 1598313601


def test_carbon_regex_rules_first_match_and_fallback(spark):
    df = parse_plaintext(spark.createDataFrame(
        [("cpu.usage 1 1",), ("disk.io.read 2 2",), ("other.thing 3 3",)],
        "line string"))
    rules = [
        CarbonRegexRule(r"^(?P<name_0>cpu)\.(?P<name_1>[a-z]+)$",
                        name_parts=["name_0", "name_1"],
                        static_labels={"plane": "sys"},
                        metric_type="cumulative"),
        CarbonRegexRule(r"^(?P<name_0>disk)\.(?P<key_op>[a-z.]+)$",
                        name_parts=["name_0"], key_parts=["key_op"]),
    ]
    out = apply_regex_rules(df, rules, name_separator="_", name_prefix="p")
    got = {r["metric_path"]: r for r in out.collect()}
    assert got["cpu.usage"]["metric_name"] == "p_cpu_usage"
    assert got["cpu.usage"]["metric_type"] == "cumulative"
    assert got["cpu.usage"]["rule_labels"] == {"plane": "sys"}
    assert got["disk.io.read"]["metric_name"] == "p_disk"
    assert got["disk.io.read"]["rule_labels"] == {"key_op": "io.read"}
    # no rule matches -> plaintext fallback (regex_parser.go:208-212)
    assert got["other.thing"]["metric_name"] == "other.thing"
    assert got["other.thing"]["metric_type"] == "gauge"


# -- statsd -----------------------------------------------------------------

def test_statsd_parse_and_rate_scaling(spark):
    df = spark.createDataFrame(
        [("req:2|c|@0.5|#env:prod,host:h1",), ("gauge1:+5|g",),
         ("gauge1:17|g",), ("lat:3|ms",)], "line string")
    got = {r["line"]: r for r in parse_statsd(df).collect()}
    r = got["req:2|c|@0.5|#env:prod,host:h1"]
    assert (r["name"], r["metric_type"], r["sample_rate"]) == ("req", "c", 0.5)
    assert r["value"] == 4.0                  # 2 / 0.5 (statsd_parser.go:187-195)
    assert r["tags"] == "env:prod,host:h1"    # sorted canon
    assert got["gauge1:+5|g"]["is_delta"] is True
    assert got["gauge1:17|g"]["is_delta"] is False
    assert got["lat:3|ms"]["metric_type"] == "ms"


def test_statsd_flush_aggregate(spark):
    df = spark.createDataFrame(
        [("c1:1|c",), ("c1:3|c",), ("g1:10|g",), ("g1:+5|g",), ("g1:+2|g",)],
        "line string")
    got = {(r["name"], r["metric_type"]): r["value"]
           for r in flush_aggregate(parse_statsd(df)).collect()}
    assert got[("c1", "c")] == 4.0            # counters sum
    assert got[("g1", "g")] == 17.0           # abs + trailing deltas


# -- metricstransform -------------------------------------------------------

def test_combine(spark):
    df = spark.createDataFrame(
        [("cpu.user", 1.0, 10), ("cpu.sys", 2.0, 10), ("mem.rss", 9.0, 10),
         ("cpu.user", 4.0, 11)],
        "metric_name string, value double, ts long")
    out = combine(df, r"^(?P<grp>cpu)\.(?P<part>[a-z]+)$", "cpu.all",
                  submatch_labels=["grp", "part"], agg="sum")
    got = rows(out.select("ts_sec", "part", "value"))
    assert got == [(10, "sys", 2.0), (10, "user", 1.0), (11, "user", 4.0)]


def test_merge_distributions_parallel_variance(spark):
    """Pooled SSD must equal the SSD of the concatenated samples
    (datapoint_aggregation.go:165-213 parallel-variance formula)."""
    a = [1.0, 2.0, 3.0]
    b = [10.0, 12.0]
    def ssd(x):
        x = np.array(x)
        return float(((x - x.mean()) ** 2).sum())
    df = spark.createDataFrame(
        [("m", [1, 2, 0], float(np.sum(a)), 3, ssd(a)),
         ("m", [0, 1, 1], float(np.sum(b)), 2, ssd(b))],
        "k string, bucket_counts array<int>, dist_sum double, "
        "dist_count long, dist_ssd double")
    got = merge_distributions(df, ["k"]).collect()[0]
    assert got["dist_count"] == 5
    assert got["dist_sum"] == sum(a) + sum(b)
    assert got["bucket_counts"] == [1, 3, 1]
    assert abs(got["dist_ssd"] - ssd(a + b)) < 1e-9


def test_label_ops(spark):
    df = spark.createDataFrame(
        [("sys.cpu", "h1", 1.0, 5), ("sys.mem", "h2", 2.0, 5)],
        "metric_name string, host string, value double, ts long")
    ren = rename_metric(df, r"^sys\.(\w+)$", "system/$1")
    assert sorted(r["metric_name"] for r in ren.collect()) == \
        ["system/cpu", "system/mem"]
    upd = update_label(df, "host", {"h1": "host-one"})
    assert sorted(r["host"] for r in upd.collect()) == ["h2", "host-one"]
    agg = aggregate_labels(df, [], "sum")
    got = rows(agg.select("metric_name", "value"))
    assert got == [("sys.cpu", 1.0), ("sys.mem", 2.0)]


# -- filters ----------------------------------------------------------------

def test_map_metadata_filter(spark):
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "attrs", F.create_map(
            F.lit("k8s.pod"), F.lit("p"), F.lit("payload_x"), F.lit("y")))
    fin = map_metadata_filter(df, "attrs", [r"^k8s\."]).collect()[0]
    assert fin["metadata"] == {"k8s.pod": "p"}
    fout = map_metadata_filter(df, "attrs", [r"^k8s\."],
                               filter_in=False).collect()[0]
    assert fout["metadata"] == {"payload_x": "y"}


def test_dim_selector(spark):
    df = spark.createDataFrame(
        [("a", "prod"), ("b", "dev"), ("c", None)], "id string, env string")
    eq = dim_selector(df, equals={"env": "prod"})
    assert [r["id"] for r in eq.collect()] == ["a"]
    ne = dim_selector(df, not_equals={"env": "prod"})
    assert sorted(r["id"] for r in ne.collect()) == ["b", "c"]


def test_tail_sample_or_of_policies(spark):
    df = spark.createDataFrame(
        [("t1", "s1", 5.0, "ok"), ("t1", "s2", 999.0, "ok"),
         ("t2", "s3", 5.0, "ok"), ("t3", "s4", 5.0, "special")],
        "trace_id string, span_id string, value double, tag string")
    pols = [SamplingPolicy("num", "numeric_attribute", attribute="value",
                           min_value=900, max_value=1000),
            SamplingPolicy("str", "string_attribute", attribute="tag",
                           values=["special"])]
    out = tail_sample(df, pols)
    # whole traces kept together: t1 (one span matched) + t3
    assert sorted(r["span_id"] for r in out.collect()) == ["s1", "s2", "s4"]


# -- partitioners -----------------------------------------------------------

def _py_ring_lookup(key: str, endpoints):
    """Pure-Python reference of consistent_hashing.go:44-68."""
    ring = build_ring(endpoints)
    h = zlib.crc32(key.encode()) % RING_POSITIONS
    for pos, ep in ring:
        if pos >= h:
            return ep
    return ring[0][1]


def test_ring_parity_with_reference(spark):
    eps = ["be-0", "be-1", "be-2"]
    keys = [f"trace-{i}" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    got = {r["k"]: r["b"] for r in df.withColumn(
        "b", ring_route_column(F.col("k"), eps)).collect()}
    for k in keys:
        assert got[k] == _py_ring_lookup(k, eps), k


def test_ring_balance(spark):
    eps = ["be-0", "be-1", "be-2", "be-3"]
    df = spark.createDataFrame([(f"t{i}",) for i in range(2000)], "k string")
    counts = (df.withColumn("b", ring_route_column(F.col("k"), eps))
              .groupBy("b").count().collect())
    assert len(counts) == 4
    for r in counts:                       # no backend starved
        assert r["count"] > 200


def test_salted_repartition_deterministic(spark):
    df = spark.createDataFrame(
        [(f"doc-{i}", "hot") for i in range(100)], "doc_id string, source string")
    a = salted_repartition(df, "source", 8)
    b = salted_repartition(df, "source", 8)
    pa = a.withColumn("p", F.spark_partition_id())
    pb = b.withColumn("p", F.spark_partition_id())
    assert rows(pa, "doc_id", "p") == rows(pb, "doc_id", "p")
    # the hot key is actually spread across partitions
    nparts = pa.select("p").distinct().count()
    assert nparts > 1


def test_salted_repartition_caps_hot_key_share(spark):
    """Quantitative skew bound: with the corpus's 70%-hot key, a plain
    repartition(key) pins the hot key's rows on ONE task while the
    salted form spreads them over (key, salt) — max task share drops
    from >=70% to <=35% (16 salt buckets, deterministic hash, so the
    bound is stable across runs)."""
    n = 2000
    df = spark.createDataFrame(
        [(f"doc-{i}", "hot" if i % 10 < 7 else f"k{i % 10}")
         for i in range(n)], "doc_id string, source string")

    def max_share(d):
        counts = [r["count"] for r in
                  d.withColumn("p", F.spark_partition_id())
                  .groupBy("p").count().collect()]
        return max(counts) / n

    assert max_share(df.repartition(8, F.col("source"))) >= 0.70
    assert max_share(salted_repartition(df, "source", 8)) <= 0.35


def test_batch_per_attr_coloc(spark):
    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(30)], "id int, src string")
    out = batch_per_attr(df, "src", 3).withColumn("p", F.spark_partition_id())
    # each attr value lands wholly in one partition
    per_src = out.groupBy("src").agg(F.count_distinct("p").alias("n")).collect()
    for r in per_src:
        assert r["n"] == 1


def test_span_metrics_matches_numpy(spark):
    import numpy as np
    from opentelemetry_collector_contrib_spark.operators.spanmetrics import span_metrics
    rows_in = [("op-a", 1.0), ("op-a", 30.0), ("op-a", 120.0),
               ("op-b", 3.0), ("op-b", 999.0)]
    df = spark.createDataFrame(rows_in, "op string, duration_ms double")
    bounds = [5.0, 50.0, 500.0]
    out = {r["op"]: r for r in span_metrics(df, ["op"], bounds=bounds).collect()}
    assert out["op-a"]["call_count"] == 3
    assert out["op-a"]["total_duration"] == 151.0
    # buckets: <=5 | 5-50 | 50-500 | >500
    assert out["op-a"]["bucket_counts"] == [1, 1, 1, 0]
    assert out["op-b"]["bucket_counts"] == [1, 0, 0, 1]


def test_tail_sample_rate_limit(spark):
    df = spark.createDataFrame(
        [("t1", 0), ("t2", 0), ("t3", 0), ("t4", 1), ("t5", 1)],
        "trace_id string, ts long")
    pol = [SamplingPolicy("rl", "rate_limiting", spans_per_second=2)]
    out = tail_sample(df, pol, ts_col="ts")
    # first 2 per second by deterministic trace order (rate_limiting.go)
    assert sorted(r["trace_id"] for r in out.collect()) == \
        ["t1", "t2", "t4", "t5"]


def test_aggregate_label_values_composition(spark):
    """metricstransform 'aggregate specific label values' = update_label
    (merge values) + aggregate_labels (re-agg) composition."""
    df = spark.createDataFrame(
        [("m", "us-east-1", 1.0, 5), ("m", "us-east-2", 2.0, 5),
         ("m", "eu-west-1", 4.0, 5)],
        "metric_name string, region string, value double, ts long")
    merged = update_label(df, "region",
                          {"us-east-1": "us", "us-east-2": "us"})
    out = aggregate_labels(merged, ["region"], "sum")
    got = rows(out.select("region", "value"))
    assert got == [("eu-west-1", 4.0), ("us", 3.0)]


def test_wavefront_parse(spark):
    from opentelemetry_collector_contrib_spark.operators.carbon import parse_wavefront
    df = spark.createDataFrame(
        [('cpu.load 2 1598313600 source=h1 dc=us',),       # int + ts
         ('"mem.used" 3.5 source=h2 env="pr\\"od"',),      # no ts, quoted
         ('disk.io 7 1598313601',)],                       # no tags
        "line string")
    got = {r["metric_name"]: r for r in parse_wavefront(df).collect()}
    r = got["cpu.load"]
    assert (r["value"], r["is_int"], r["ts"]) == (2.0, True, 1598313600)
    assert r["source"] == "h1" and r["tags"]["dc"] == "us"
    r = got["mem.used"]
    assert (r["value"], r["is_int"], r["ts"]) == (3.5, False, None)
    assert r["source"] == "h2" and r["tags"]["env"] == 'pr"od'
    r = got["disk.io"]
    assert r["ts"] == 1598313601 and r["source"] is None and r["tags"] == {}


def test_attrs_map_merge_disciplines(spark):
    from opentelemetry_collector_contrib_spark.functions.attributes import (
        attrs_from_columns, merge_maps, promote_keys)
    df = spark.createDataFrame([("d1", "app", None)],
                               "doc_id string, source string, ns string")
    df = df.withColumn("attrs", attrs_from_columns(["source", "ns"]))
    row = df.collect()[0]
    assert row["attrs"] == {"source": "app"}          # NULL omitted
    inc = F.create_map(F.lit("source"), F.lit("NEW"), F.lit("k"), F.lit("v"))
    got = df.select(
        merge_maps(F.col("attrs"), inc, "insert").alias("ins"),
        merge_maps(F.col("attrs"), inc, "upsert").alias("ups"),
        merge_maps(F.col("attrs"), inc, "update").alias("upd")).collect()[0]
    assert got["ins"] == {"source": "app", "k": "v"}  # existing wins
    assert got["ups"] == {"source": "NEW", "k": "v"}  # incoming wins
    assert got["upd"] == {"source": "NEW"}            # only existing keys
    back = promote_keys(df, "attrs", ["source"], prefix="p_").collect()[0]
    assert back["p_source"] == "app"
