"""awsxray exporter/receiver span <-> segment translation, batch-first.

The reference exporter turns each OTel span into an X-Ray segment
document (exporter/awsxrayexporter/translator/segment.go:84-201):

- segment type: ``subsegment`` when the span is not a SERVER span and
  has a parent; only root segments store resource data (:86-94).
- trace id: ``1-{epoch hex8}-{96-bit hex24}`` where the epoch is the
  first 4 bytes of the OTel trace id; ids older than 28 days or more
  than 5 minutes in the future are rejected and the span dropped
  (:278-320 convertToAmazonTraceID).
- name precedence (:115-173): peer.service > aws.service (namespace
  "aws") > db.name > resource service.name (SERVER spans only) >
  rpc.service > http.host > net.peer.name > sanitized span name
  (invalid chars stripped, 200-char cap, empty -> "span",
  :437-450 fixSegmentName).
- namespace: "aws" via the aws.service path, else "remote" for CLIENT
  spans (:175-177).
- origin (:213-273): only for cloud.provider == aws; explicit
  cloud.infrastructure_service wins, else the attribute-presence chain
  EKS > ElasticBeanstalk > ECS > EC2.
- error/fault (cause.go:30-134): only spans with OTel status Error;
  an http status 400-499 is an error, anything else (or no status) a
  fault.
- start/end: float seconds = ns / 1e9 (:322-324).

``xray_segments_to_spans`` is the receiver-direction inverse
(receiver/awsxrayreceiver/internal/translator/translator.go): X-Ray
trace id back to the 32-hex OTel id, float seconds back to nanos.

Batch shape: both directions are single JVM-side projections over a
span/segment DataFrame — no shuffle, whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MAX_AGE_S = 60 * 60 * 24 * 28        # segment.go:283 maxAge
MAX_SKEW_S = 60 * 5                  # segment.go:286 maxSkew
_INVALID_NAME_RX = r"[^ 0-9\p{L}N_.:/%&#=+,\-@]"   # segment.go:47
MAX_SEGMENT_NAME = 200

ORIGIN_EC2 = "AWS::EC2::Instance"
ORIGIN_ECS = "AWS::ECS::Container"
ORIGIN_ECS_EC2 = "AWS::ECS::EC2"
ORIGIN_ECS_FARGATE = "AWS::ECS::Fargate"
ORIGIN_EB = "AWS::ElasticBeanstalk::Environment"
ORIGIN_EKS = "AWS::EKS::Container"


def _nz(col):
    """Treat empty string like an absent attribute."""
    return F.when((col.isNotNull()) & (col != ""), col)


def make_xray_segments(df: DataFrame, now_epoch: int) -> DataFrame:
    """Span rows -> X-Ray segment rows.

    Expected span columns (absent attributes are null): trace_id (32
    lowercase hex), span_id, parent_span_id, kind (SERVER/CLIENT/...),
    span_name, start_ns, end_ns, status_code ('OK'/'ERROR'/'UNSET'),
    http_status (long), peer_service, aws_service, db_name,
    rpc_service, http_host, net_peer_name, enduser_id + resource
    columns service_name, cloud_provider, infra_service, ecs_launchtype,
    k8s_cluster, service_instance, container_name, host_id.

    Spans whose trace-id epoch falls outside [now-28d, now+5m] are
    dropped, matching the exporter's invalid-traceid error path.
    """
    epoch = F.conv(F.substring("trace_id", 1, 8), 16, 10).cast("bigint")
    delta = F.lit(int(now_epoch)) - epoch
    valid = (delta <= MAX_AGE_S) & (delta >= -MAX_SKEW_S)

    xray_trace_id = F.concat(F.lit("1-"), F.substring("trace_id", 1, 8),
                             F.lit("-"), F.substring("trace_id", 9, 24))

    is_server = F.col("kind") == "SERVER"
    has_parent = _nz(F.col("parent_span_id")).isNotNull()
    segment_type = F.when(~is_server & has_parent, F.lit("subsegment")) \
                    .otherwise(F.lit(""))

    fixed_name = F.regexp_replace(
        F.coalesce(F.col("span_name"), F.lit("")), _INVALID_NAME_RX, "")
    fixed_name = F.substring(fixed_name, 1, MAX_SEGMENT_NAME)
    fixed_name = F.when(fixed_name == "", F.lit("span")).otherwise(fixed_name)
    name = F.coalesce(
        _nz(F.col("peer_service")),
        _nz(F.col("aws_service")),
        _nz(F.col("db_name")),
        F.when(is_server, _nz(F.col("service_name"))),
        _nz(F.col("rpc_service")),
        _nz(F.col("http_host")),
        _nz(F.col("net_peer_name")),
        fixed_name)

    aws_named = (_nz(F.col("peer_service")).isNull()
                 & _nz(F.col("aws_service")).isNotNull())
    namespace = F.when(aws_named, F.lit("aws")) \
                 .when(F.col("kind") == "CLIENT", F.lit("remote")) \
                 .otherwise(F.lit(""))

    non_aws = (_nz(F.col("cloud_provider")).isNotNull()
               & (F.col("cloud_provider") != "aws"))
    infra = _nz(F.col("infra_service"))
    origin = F.when(non_aws, F.lit("")) \
        .when(infra == "EKS", F.lit(ORIGIN_EKS)) \
        .when(infra == "ElasticBeanstalk", F.lit(ORIGIN_EB)) \
        .when(infra == "ECS",
              F.when(F.col("ecs_launchtype") == "ec2",
                     F.lit(ORIGIN_ECS_EC2))
               .when(F.col("ecs_launchtype") == "fargate",
                     F.lit(ORIGIN_ECS_FARGATE))
               .otherwise(F.lit(ORIGIN_ECS))) \
        .when(infra == "EC2", F.lit(ORIGIN_EC2)) \
        .when(infra.isNotNull(), F.lit("")) \
        .when(_nz(F.col("k8s_cluster")).isNotNull(), F.lit(ORIGIN_EKS)) \
        .when(_nz(F.col("service_instance")).isNotNull(), F.lit(ORIGIN_EB)) \
        .when(_nz(F.col("container_name")).isNotNull(), F.lit(ORIGIN_ECS)) \
        .when(_nz(F.col("host_id")).isNotNull(), F.lit(ORIGIN_EC2)) \
        .otherwise(F.lit(""))

    status_error = F.col("status_code") == "ERROR"
    http = F.col("http_status")
    is_error = status_error & http.isNotNull() & (http >= 400) & (http <= 499)
    is_fault = status_error & ~(http.isNotNull()
                                & (http >= 400) & (http <= 499))

    return (df.where(valid).select(
        F.col("span_id").alias("id"),
        xray_trace_id.alias("trace_id_xray"),
        name.alias("name"),
        segment_type.alias("segment_type"),
        namespace.alias("namespace"),
        origin.alias("origin"),
        (F.col("start_ns").cast("double") / F.lit(1e9)).alias("start_time"),
        (F.col("end_ns").cast("double") / F.lit(1e9)).alias("end_time"),
        F.coalesce(_nz(F.col("parent_span_id")), F.lit(""))
        .alias("parent_id"),
        is_error.alias("error"),
        is_fault.alias("fault"),
        F.coalesce(_nz(F.col("enduser_id")), F.lit("")).alias("user"),
    ))


def xray_segments_to_spans(df: DataFrame) -> DataFrame:
    """Receiver-direction inverse: segment rows back to span id/timing
    columns (awsxrayreceiver translator semantics for ids and times)."""
    tid = F.col("trace_id_xray")
    otel_trace = F.concat(F.substring(tid, 3, 8), F.substring(tid, 12, 24))
    return df.select(
        F.col("id").alias("span_id"),
        otel_trace.alias("trace_id"),
        F.when(F.col("parent_id") != "", F.col("parent_id"))
        .alias("parent_span_id"),
        F.col("name").alias("span_name"),
        (F.col("start_time") * F.lit(1e9)).cast("bigint").alias("start_ns"),
        (F.col("end_time") * F.lit(1e9)).cast("bigint").alias("end_ns"),
        F.when(F.col("error") | F.col("fault"), F.lit("ERROR"))
        .otherwise(F.lit("UNSET")).alias("status_code"),
    )
