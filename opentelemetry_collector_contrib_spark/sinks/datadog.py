"""datadogexporter analog — spans → Datadog APM span rows.

Reference: ``exporter/datadogexporter/translate_traces.go`` —

- hostname resolution (metadata/host.go:80-116, ec2/ec2.go:86-97):
  ``datadog.host.name`` → ``k8s.node.name`` (suffixed ``-<cluster>``
  when ``k8s.cluster.name`` exists) → ``container.id`` → for
  ``cloud.provider=aws`` a DIRECT return of (non-default-prefixed
  ``host.name``, else ``host.id``, else the config hostname — the
  chain does NOT fall through past the aws branch) → ``host.id`` →
  ``host.name`` → config hostname;
- service = resource ``service.name`` (removed from the tag map,
  :265-274), defaulting to "OTLPResourceNoServiceName"; an
  EMPTY-string service.name falls back to cfg.Service (:185-187);
  a span-level ``service.name`` attr overrides via setStringTag
  (:340-356);
- env = cfg.Env overridden by resource ``deployment.environment``
  (:124-128); payloads group by (hostname, env) (:77-101);
- tags = resource attrs + ``otel.library.name``/``.version`` when
  non-empty (:276-283) + span attrs (span wins) +
  ``_dd.tags.container`` built from ``container.id``/``k8s.pod.name``
  — ALWAYS set, possibly empty (:285-316);
- version tag: ``service.version`` overrides, else cfg.Version only
  when no ``version`` tag exists (:189-199); non-empty trace state →
  ``w3c.tracestate`` (:202-204);
- span name = NormalizeSpanName("<il-name>.<KIND>") with the il name
  from ``otel.library.name`` else the legacy
  ``otel.instrumentation_library.name`` else "opentelemetry"
  (:388-408); NormalizeSpanName (utils/trace_helpers.go:40-105):
  lowercase, leading non-letters stripped, non-[a-z0-9.] runs
  collapsed to one ``_``, ≤200 chars, trailing ``_`` stripped
  (ASCII subset of the unicode-aware Go walk);
- resource name precedence (:410-447): http.method (+ http.route,
  else + grpc.path) → messaging.operation (+ destination) →
  rpc.method (+ rpc.service) → span name;
- type: CLIENT→"http", SERVER→"web", else "custom" (:320-329),
  overridden by a ``span.type`` attr;
- error (:449-488): status ERROR → 1 with ``error.type`` =
  "ERR_CODE_<code>" and ``error.msg`` = message-or-code; an
  ``http.status_code`` tag ≥500 always errors, ≥400 errors only for
  CLIENT spans;
- ``analytics.event`` attr → Metrics["_dd1.sr.eausr"] = 0/1
  (:347-352); service.name / span.type / analytics.event never reach
  Meta;
- APM ids (:369-386): low 8 bytes of the hex id as uint64 decimal;
  ParentID 0 when the parent id is absent/invalid;
- the APITrace rollup (:358-367) keeps StartTime = min(span start)
  but its EndTime comparison is inverted (``if apiTrace.EndTime >
  endTime``) so EndTime stays 0 — mirrored honestly by
  ``datadog_trace_rollup``;
- the sublayer metrics / analyzed-spans extraction delegate to
  vendored datadog-agent samplers (model.go:47, stats.go) — out of
  scope here (library logic, not collector translation).

Batch shape: one Catalyst projection per span; the trace rollup is a
single two-phase aggregate keyed by (hostname, env, trace).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.attributes import merge_maps

NO_SERVICE_NAME = "OTLPResourceNoServiceName"
EC2_DEFAULT_PREFIXES = ("ip-", "domu", "ec2amaz-")
_EMPTY_S = "cast(map() as map<string,string>)"


def _g(m, key):
    return F.try_element_at(m, F.lit(key))


def _ne(col):
    return col.isNotNull() & (col != "")


def normalize_span_name(col):
    """utils/trace_helpers.go:40-105 (ASCII subset)."""
    s = F.lower(col)
    s = F.regexp_replace(s, r"^[^a-z]+", "")
    s = F.regexp_replace(s, r"[^a-z0-9.]+", "_")
    s = F.substring(s, 1, 200)
    return F.regexp_replace(s, r"_$", "")


def apm_id_dec(hex_col):
    """decodeAPMId (:377-386): low 16 hex chars as uint64 decimal."""
    low = F.when(F.length(hex_col) > 16,
                 F.substring(hex_col, -16, 16)).otherwise(hex_col)
    return F.conv(low, 16, 10)


def dd_hostname(resource, cfg_hostname: str):
    """metadata/host.go:80-116 with the aws direct-return quirk."""
    node = _g(resource, "k8s.node.name")
    cluster = _g(resource, "k8s.cluster.name")
    host_name = _g(resource, "host.name")
    is_default = F.lit(False)
    for p in EC2_DEFAULT_PREFIXES:
        is_default = is_default | F.startswith(F.coalesce(host_name, F.lit("")),
                                               F.lit(p))
    aws = F.coalesce(
        F.when(host_name.isNotNull() & ~is_default, host_name),
        _g(resource, "host.id"), F.lit(cfg_hostname))
    return (
        F.when(_g(resource, "datadog.host.name").isNotNull(),
               _g(resource, "datadog.host.name"))
        .when(node.isNotNull(),
              F.when(cluster.isNotNull(),
                     F.concat(node, F.lit("-"), cluster)).otherwise(node))
        .when(_g(resource, "container.id").isNotNull(),
              _g(resource, "container.id"))
        .when(F.coalesce(_g(resource, "cloud.provider"), F.lit("")) == "aws",
              aws)
        .when(_g(resource, "host.id").isNotNull(), _g(resource, "host.id"))
        .when(host_name.isNotNull(), host_name)
        .otherwise(F.lit(cfg_hostname)))


def _serialize(m):
    return F.array_join(
        F.transform(F.array_sort(F.map_entries(m)),
                    lambda e: F.concat(e["key"], F.lit("="), e["value"])), ",")


def datadog_spans(spans: DataFrame, cfg_env: str = "none",
                  cfg_service: str = "", cfg_version: str = "",
                  cfg_hostname: str = "otelcol") -> DataFrame:
    """Span battery → flat Datadog APM span rows.  Input: trace_id,
    span_id, parent_span_id (nullable), name, kind (lowercase),
    start_ns, end_ns, status_code, status_message, trace_state, attrs
    (map<string,string>), resource (map<string,string>), lib_name,
    lib_version."""
    res = F.col("resource")
    attrs = F.col("attrs")

    res_service = _g(res, "service.name")
    service = F.when(res_service.isNull(), F.lit(NO_SERVICE_NAME)) \
        .when((res_service == "") & (F.lit(cfg_service) != ""),
              F.lit(cfg_service)).otherwise(res_service)
    service = F.coalesce(_g(attrs, "service.name"), service)

    env = F.coalesce(_g(res, "deployment.environment"), F.lit(cfg_env))

    empty = F.expr(_EMPTY_S)
    dd_tags = F.map_filter(res, lambda k, v: k != F.lit("service.name"))
    il_tags = F.map_concat(
        F.when(_ne(F.col("lib_name")),
               F.create_map(F.lit("otel.library.name"), F.col("lib_name")))
        .otherwise(empty),
        F.when(_ne(F.col("lib_version")),
               F.create_map(F.lit("otel.library.version"),
                            F.col("lib_version"))).otherwise(empty))

    # The tag map is built in STAGES, each merged layer landing in an
    # aliased column that the next layer references as a plain column.
    # Building the whole chain as one nested expression re-inlines
    # every earlier layer at every later lookup (the version layer
    # reads two keys of the previous map, the final projection reads
    # the finished map ~15 times) — a ~20 MiB serialized task binary
    # that OOM'd an 8 GiB driver at 32 concurrent tasks.  Catalyst's
    # CollapseProject keeps these staged aliases un-inlined because
    # each is non-cheap and referenced more than once (SPARK-36718),
    # and whole-stage codegen still fuses the projections into one
    # stage — same plan shape, bounded expression size.
    spans = spans.withColumn(
        "_t0", merge_maps(merge_maps(dd_tags, il_tags, mode="upsert"),
                          attrs, mode="upsert"))
    t0 = F.col("_t0")

    # _dd.tags.container from the merged tag view (:299, :305-316)
    cid = _g(t0, "container.id")
    pod = _g(t0, "k8s.pod.name")
    container = F.concat_ws(
        ",",
        F.when(cid.isNotNull(), F.concat(F.lit("container_id:"), cid)),
        F.when(pod.isNotNull(), F.concat(F.lit("pod_name:"), pod)))
    spans = spans.withColumn(
        "_t1", merge_maps(t0, F.create_map(F.lit("_dd.tags.container"),
                                           container), mode="upsert"))
    t1 = F.col("_t1")

    sv = _g(t1, "service.version")
    version = F.when(_ne(sv), sv) \
        .when(~_ne(F.coalesce(_g(t1, "version"), F.lit("")))
              & (F.lit(cfg_version) != ""), F.lit(cfg_version))
    spans = spans.withColumn(
        "_t2", merge_maps(t1,
                          F.when(version.isNotNull(),
                                 F.create_map(F.lit("version"), version))
                          .otherwise(empty), mode="upsert"))
    t2 = F.col("_t2")

    # error flag + tags (:449-488)
    code = F.col("status_code")
    status_err = (code == 2)
    err_tags = F.when(
        status_err,
        F.map_concat(
            F.create_map(F.lit("error.type"),
                         F.concat(F.lit("ERR_CODE_"), code.cast("string"))),
            F.create_map(F.lit("error.msg"),
                         F.when(_ne(F.col("status_message")),
                                F.col("status_message"))
                         .otherwise(F.concat(F.lit("ERR_CODE_"),
                                             code.cast("string")))))) \
        .otherwise(empty)
    spans = spans.withColumn(
        "_tags", merge_maps(
            merge_maps(t2,
                       F.when(_ne(F.col("trace_state")),
                              F.create_map(F.lit("w3c.tracestate"),
                                           F.col("trace_state")))
                       .otherwise(empty), mode="upsert"),
            err_tags, mode="upsert"))
    tags = F.col("_tags")
    hsc = _g(tags, "http.status_code").try_cast("long")
    kind = F.lower(F.coalesce(F.col("kind"), F.lit("")))
    is_error = F.when(status_err |
                      (hsc >= 500) |
                      ((kind == "client") & (hsc >= 400)), 1).otherwise(0)

    # span name from the IL tag chain (:388-408)
    iln = F.coalesce(_g(tags, "otel.library.name"),
                     _g(tags, "otel.instrumentation_library.name"),
                     F.lit("opentelemetry"))
    kind_name = F.upper(F.when(kind == "", "unspecified").otherwise(kind))
    dd_name = normalize_span_name(F.concat(iln, F.lit("."), kind_name))

    # resource name precedence (:410-447)
    method = _g(tags, "http.method")
    resource_name = (
        F.when(method.isNotNull(),
               F.when(_g(tags, "http.route").isNotNull(),
                      F.concat(method, F.lit(" "), _g(tags, "http.route")))
               .when(_g(tags, "grpc.path").isNotNull(),
                     F.concat(method, F.lit(" "), _g(tags, "grpc.path")))
               .otherwise(method))
        .when(_g(tags, "messaging.operation").isNotNull(),
              F.when(_g(tags, "messaging.destination").isNotNull(),
                     F.concat(_g(tags, "messaging.operation"), F.lit(" "),
                              _g(tags, "messaging.destination")))
              .otherwise(_g(tags, "messaging.operation")))
        .when(_g(tags, "rpc.method").isNotNull(),
              F.when(_g(tags, "rpc.service").isNotNull(),
                     F.concat(_g(tags, "rpc.method"), F.lit(" "),
                              _g(tags, "rpc.service")))
              .otherwise(_g(tags, "rpc.method")))
        .otherwise(F.col("name")))

    dd_type = F.coalesce(
        _g(attrs, "span.type"),
        F.when(kind == "client", "http").when(kind == "server", "web")
        .otherwise("custom"))

    analytics = _g(attrs, "analytics.event")
    metrics = F.when(analytics.isNotNull(),
                     F.create_map(F.lit("_dd1.sr.eausr"),
                                  F.when(analytics != "false", 1.0)
                                  .otherwise(0.0))) \
        .otherwise(F.expr("cast(map() as map<string,double>)"))

    meta = F.map_filter(
        tags, lambda k, v: ~k.isin("service.name", "span.type",
                                   "analytics.event"))

    duration = F.when(F.col("end_ns") == 0, F.lit(0).cast("long")) \
        .otherwise(F.col("end_ns") - F.col("start_ns"))
    parent_ok = _ne(F.coalesce(F.col("parent_span_id"), F.lit(""))) & \
        (F.conv(F.col("parent_span_id"), 16, 10).try_cast("decimal(20,0)")
         != 0)

    return spans.select(
        dd_hostname(res, cfg_hostname).alias("hostname"),
        env.alias("env"),
        service.alias("service"),
        dd_name.alias("dd_name"),
        resource_name.alias("resource_name"),
        apm_id_dec(F.col("trace_id")).alias("trace_id_dec"),
        apm_id_dec(F.col("span_id")).alias("span_id_dec"),
        F.when(parent_ok, apm_id_dec(F.col("parent_span_id")))
        .otherwise(F.lit("0")).alias("parent_id_dec"),
        F.col("start_ns"), duration.alias("duration_ns"),
        dd_type.alias("dd_type"),
        is_error.alias("error"),
        _serialize(meta).alias("meta_s"),
        _serialize(F.transform_values(metrics,
                                      lambda k, v: v.cast("string")))
        .alias("metrics_s"))


def datadog_trace_rollup(dd: DataFrame) -> DataFrame:
    """APITrace assembly (:141-169, :358-367): spans keyed by
    (hostname|env payload, trace id); StartTime = min span start;
    EndTime mirrors the reference's inverted comparison and stays 0."""
    return (dd.groupBy("hostname", "env", "trace_id_dec")
            .agg(F.count("*").cast("long").alias("n_spans"),
                 F.min("start_ns").alias("trace_start"))
            .withColumn("trace_end", F.lit(0).cast("long")))
