"""awsxray span<->segment translation (segment.go / cause.go)."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.xray import (
    make_xray_segments, xray_segments_to_spans,
)

NOW = 1598400000
COLS = ("trace_id span_id parent_span_id kind span_name start_ns end_ns "
        "status_code http_status peer_service aws_service db_name "
        "rpc_service http_host net_peer_name enduser_id service_name "
        "cloud_provider infra_service ecs_launchtype k8s_cluster "
        "service_instance container_name host_id").split()


def _span(**kw):
    base = {c: None for c in COLS}
    epoch_hex = format(NOW - 100, "08x")
    base.update(trace_id=epoch_hex + "a" * 24, span_id="b" * 16,
                kind="SERVER", span_name="GET /x", start_ns=1_000_000_000,
                end_ns=2_500_000_000, status_code="UNSET")
    base.update(kw)
    return base


def _segments(spark, rows, now=NOW):
    schema = ("trace_id string, span_id string, parent_span_id string, "
              "kind string, span_name string, start_ns long, end_ns long, "
              "status_code string, http_status long, peer_service string, "
              "aws_service string, db_name string, rpc_service string, "
              "http_host string, net_peer_name string, enduser_id string, "
              "service_name string, cloud_provider string, "
              "infra_service string, ecs_launchtype string, "
              "k8s_cluster string, service_instance string, "
              "container_name string, host_id string")
    df = spark.createDataFrame([tuple(r[c] for c in COLS) for r in rows],
                               schema)
    return make_xray_segments(df, now_epoch=now)


def test_trace_id_and_times(spark):
    seg = _segments(spark, [_span()]).collect()[0]
    epoch_hex = format(NOW - 100, "08x")
    assert seg.trace_id_xray == f"1-{epoch_hex}-" + "a" * 24
    assert seg.start_time == 1.0 and seg.end_time == 2.5
    assert seg.segment_type == ""          # SERVER span = root segment
    # expired trace id dropped (29 days old)
    old = format(NOW - 29 * 86400, "08x")
    assert _segments(spark, [_span(trace_id=old + "a" * 24)]).count() == 0
    # 2 minutes in the future is within skew
    fut = format(NOW + 120, "08x")
    assert _segments(spark, [_span(trace_id=fut + "a" * 24)]).count() == 1


def test_name_precedence_and_namespace(spark):
    rows = [
        _span(span_id="1" * 16, peer_service="peers", aws_service="S3"),
        _span(span_id="2" * 16, aws_service="S3", kind="CLIENT"),
        _span(span_id="3" * 16, db_name="mydb"),
        _span(span_id="4" * 16, kind="SERVER", service_name="svc"),
        _span(span_id="5" * 16, kind="CLIENT", service_name="svc",
              http_host="example.com"),
        _span(span_id="6" * 16, kind="CLIENT", span_name="my$span%ok"),
        _span(span_id="7" * 16, span_name="$$$"),
    ]
    segs = {r.id: r for r in _segments(spark, rows).collect()}
    assert segs["1" * 16].name == "peers"
    assert segs["1" * 16].namespace == ""        # peer.service won, not aws
    assert segs["2" * 16].name == "S3"
    assert segs["2" * 16].namespace == "aws"
    assert segs["3" * 16].name == "mydb"
    assert segs["4" * 16].name == "svc"          # SERVER -> resource name
    assert segs["5" * 16].name == "example.com"  # CLIENT skips resource
    assert segs["5" * 16].namespace == "remote"
    assert segs["6" * 16].name == "myspan%ok"    # invalid chars stripped
    assert segs["7" * 16].name == "span"         # empty after strip
    # subsegment typing: CLIENT with a parent
    sub = _segments(spark, [_span(kind="CLIENT",
                                  parent_span_id="c" * 16)]).collect()[0]
    assert sub.segment_type == "subsegment"
    assert sub.parent_id == "c" * 16


def test_origin_chain(spark):
    rows = [
        _span(span_id="1" * 16, cloud_provider="aws", infra_service="ECS",
              ecs_launchtype="fargate"),
        _span(span_id="2" * 16, cloud_provider="aws", k8s_cluster="k"),
        _span(span_id="3" * 16, cloud_provider="gcp", k8s_cluster="k"),
        _span(span_id="4" * 16, host_id="i-123"),
        _span(span_id="5" * 16, cloud_provider="aws", infra_service="Azure"),
    ]
    segs = {r.id: r for r in _segments(spark, rows).collect()}
    assert segs["1" * 16].origin == "AWS::ECS::Fargate"
    assert segs["2" * 16].origin == "AWS::EKS::Container"
    assert segs["3" * 16].origin == ""           # non-aws provider
    assert segs["4" * 16].origin == "AWS::EC2::Instance"
    assert segs["5" * 16].origin == ""           # unknown infra value


def test_error_fault_split(spark):
    rows = [
        _span(span_id="1" * 16, status_code="ERROR", http_status=404),
        _span(span_id="2" * 16, status_code="ERROR", http_status=503),
        _span(span_id="3" * 16, status_code="ERROR"),
        _span(span_id="4" * 16, status_code="OK", http_status=500),
    ]
    segs = {r.id: r for r in _segments(spark, rows).collect()}
    assert (segs["1" * 16].error, segs["1" * 16].fault) == (True, False)
    assert (segs["2" * 16].error, segs["2" * 16].fault) == (False, True)
    assert (segs["3" * 16].error, segs["3" * 16].fault) == (False, True)
    assert (segs["4" * 16].error, segs["4" * 16].fault) == (False, False)


def test_round_trip(spark):
    spans = [_span(span_id="1" * 16, kind="CLIENT",
                   parent_span_id="c" * 16, status_code="ERROR",
                   http_status=500)]
    segs = _segments(spark, spans)
    back = xray_segments_to_spans(segs).collect()[0]
    assert back.trace_id == spans[0]["trace_id"]
    assert back.span_id == "1" * 16
    assert back.parent_span_id == "c" * 16
    assert back.start_ns == spans[0]["start_ns"]
    assert back.end_ns == spans[0]["end_ns"]
    assert back.status_code == "ERROR"


def test_null_span_name_falls_back_to_span(spark):
    seg = _segments(spark, [_span(span_name=None, kind="INTERNAL")])
    assert seg.collect()[0].name == "span"
