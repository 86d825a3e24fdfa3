"""YAML config-driven assembly — the service.pipelines round-trip +
end-to-end, mirroring receiver/stanzareceiver/testdata/config.yaml and
the config_test.go round-trip style."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.plans.config import (
    build_from_config, load_config, run_from_config)


def _yaml(sf_dir, out):
    return f"""
receivers:
  tokens:
    path: {sf_dir}/tokens.parquet
processors:
  parse:
    kind: regex_parser
  ip:
    kind: kv_extract
    key: pod_ip
  enrich:
    kind: k8s_enrich
    pods_path: {sf_dir}/pods.parquet
    key: pod_ip
  env:
    kind: resource_detection
    attributes:
      cluster: c1
  route:
    kind: routing
    from_attribute: source
    table:
      hot-source: [sumologic]
      app-a: [sumologic, loki]
      k8s: [loki]
    default: [default-sink]
service:
  pipelines:
    logs:
      receivers: [tokens]
      processors: [parse, ip, enrich, env, route]
      exporters: [sumologic, loki, default-sink]
exporters:
  sumologic:
    path: {out}/sumo
    log_format: json
    metadata_regexes: ["^source$"]
  loki:
    path: {out}/loki
    label_allowlist: [doc_id, payload, severity_text]
  default-sink:
    path: {out}/dflt
"""


def test_config_roundtrip_and_e2e(spark, sf_dir, tmp_path):
    cfg = load_config(_yaml(sf_dir, tmp_path))
    routed = build_from_config(spark, cfg)
    # config lineage == programmatic lineage (same routed counts)
    from opentelemetry_collector_contrib_spark.operators.enrich import (
        broadcast_enrich, prepare_pods_dim)
    from opentelemetry_collector_contrib_spark.operators.regex_parser import (
        RegexParser, kv_extract)
    from opentelemetry_collector_contrib_spark.operators.routing import (
        DEFAULT_ROUTES, with_route)
    from opentelemetry_collector_contrib_spark.sources.tokens_source import (
        read_tokens)
    prog = RegexParser().apply(read_tokens(spark, f"{sf_dir}/tokens.parquet"))
    prog = kv_extract(prog, "pod_ip")
    prog = broadcast_enrich(
        prog, prepare_pods_dim(spark.read.parquet(f"{sf_dir}/pods.parquet")),
        "pod_ip")
    prog = with_route(prog, DEFAULT_ROUTES)
    a = (routed.select(F.explode("sinks").alias("s")).groupBy("s").count())
    b = (prog.select(F.explode("sinks").alias("s")).groupBy("s").count())
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # resource_detection constant applied
    assert routed.select("cluster").first()["cluster"] == "c1"

    counts = run_from_config(spark, cfg)
    expect = {r["s"]: r["count"] for r in b.collect()}
    assert counts == expect

    # loki allowlist projected
    loki = spark.read.parquet(f"{tmp_path}/loki")
    assert sorted(loki.columns) == ["doc_id", "payload", "severity_text"]
    # sumologic json payload carries the log body
    sumo = spark.read.parquet(f"{tmp_path}/sumo")
    assert '"log":' in sumo.select("payload").first()["payload"]


def test_config_filter_predicate(spark, sf_dir):
    cfg = load_config(f"""
receivers:
  tokens: {{path: {sf_dir}/tokens.parquet}}
processors:
  parse: {{kind: regex_parser}}
  errors: {{kind: filter, expr: "severity_number >= 17"}}
service:
  pipelines:
    logs:
      receivers: [tokens]
      processors: [parse, errors]
      exporters: []
exporters: {{}}
""")
    out = build_from_config(spark, cfg)
    assert out.filter(F.col("severity_number") < 17).count() == 0
    assert out.count() > 0


def test_wire_receiver_config_matches_tokens_receiver(spark, sf_dir,
                                                      tmp_path):
    """Swapping the tokens scan for the wire receiver (raw protobuf+
    gzip frames) in the YAML changes NOTHING downstream: same routed
    counts through the identical processor lineage."""
    from opentelemetry_collector_contrib_spark.sources.tokens_source import (
        read_tokens)
    from opentelemetry_collector_contrib_spark.sources.wire import (
        encode_wire_udf)
    frames_dir = str(tmp_path / "frames")
    enc = encode_wire_udf("gzip")
    (read_tokens(spark, f"{sf_dir}/tokens.parquet")
     .select(enc("doc_id", "tokens", "source").alias("wire"))
     .write.parquet(frames_dir))
    base = _yaml(sf_dir, tmp_path / "out_t")
    wire_yaml = base.replace(
        f"""  tokens:
    path: {sf_dir}/tokens.parquet""",
        f"""  tokens:
    type: wire
    path: {frames_dir}""")
    cfg_t = load_config(base)
    cfg_w = load_config(wire_yaml)
    a = (build_from_config(spark, cfg_t)
         .select(F.explode("sinks").alias("s")).groupBy("s").count())
    b = (build_from_config(spark, cfg_w)
         .select(F.explode("sinks").alias("s")).groupBy("s").count())
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_config_syslog_csv_recombine_stages(spark, sf_dir):
    """The stanza-style parser additions are YAML-wireable: a syslog
    parse stage, a csv parse stage, and a recombine stage each resolve
    from the registry and transform the stream."""
    cfg = load_config(f"""
receivers:
  tokens: {{path: {sf_dir}/tokens.parquet}}
processors:
  parse: {{kind: regex_parser}}
  sys: {{kind: syslog_parser, parse_from: body}}
service:
  pipelines:
    logs:
      receivers: [tokens]
      processors: [parse, sys]
      exporters: []
exporters: {{}}
""")
    out = build_from_config(spark, cfg)
    # log bodies are not syslog -> kept with NULL format (the stanza
    # on-error discipline), schema carries the syslog columns
    assert {"format", "facility", "severity_name"} <= set(out.columns)
    assert out.count() > 0

    cfg2 = load_config(f"""
receivers:
  tokens: {{path: {sf_dir}/tokens.parquet}}
processors:
  parse: {{kind: regex_parser}}
  stack:
    kind: recombine
    is_first_entry: "body NOT LIKE '  %'"
    keys: [source]
    order: doc_id
    tiebreak: doc_id
    combine_field: body
    combine_with: "\\n"
service:
  pipelines:
    logs:
      receivers: [tokens]
      processors: [parse, stack]
      exporters: []
exporters: {{}}
""")
    out2 = build_from_config(spark, cfg2)
    assert {"entry_id", "n_lines", "body"} <= set(out2.columns)
    n_sources = out2.select("source").distinct().count()
    assert out2.count() >= n_sources


def test_config_rate_limit_stage(spark, sf_dir):
    cfg = load_config(f"""
receivers:
  tokens: {{path: {sf_dir}/tokens.parquet}}
processors:
  parse: {{kind: regex_parser}}
  throttle:
    kind: rate_limit
    rate: 1
    interval_ms: 86400000
    keys: [source]
    time: event_ts
    tiebreak: doc_id
service:
  pipelines:
    logs:
      receivers: [tokens]
      processors: [parse, throttle]
      exporters: []
exporters: {{}}
""")
    out = build_from_config(spark, cfg)
    per_day = (out.groupBy("source",
                           F.window("event_ts", "1 day")).count())
    assert per_day.filter(F.col("count") > 1).count() == 0
    assert out.count() > 0
