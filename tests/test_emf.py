"""awsemf EMF serialization (metric_translator.go semantics)."""

import pytest

from opentelemetry_collector_contrib_spark.sinks.emf import (
    NO_ROLLUP, SINGLE_ONLY, ZERO_AND_SINGLE, emf_events,
)

SCHEMA = ("metric_name string, unit string, value_i long, value_d double, "
          "ts_ms long, labels map<string,string>, "
          "instrumentation_lib string, service_name string, "
          "service_namespace string")


def _dp(spark, labels, iln="mylib", svc="svc", ns="myns"):
    return spark.createDataFrame(
        [("latency", "ms", None, 1.5, 1600000000000, labels, iln, svc, ns)],
        SCHEMA)


def test_emf_dimension_rollup_zero_and_single(spark):
    out = emf_events(_dp(spark, {"b": "2", "a": "1"})).collect()[0]
    meas = out.emf._aws.CloudWatchMetrics[0]
    # namespace precedence: service.namespace/service.name
    assert meas.Namespace == "myns/svc"
    dims = [list(d) for d in meas.Dimensions]
    # full set (sorted labels + OTelLib), zero rollup, one single per key
    assert dims == [["a", "b", "OTelLib"], ["OTelLib"],
                    ["OTelLib", "a"], ["OTelLib", "b"]]
    assert meas.Metrics[0].Name == "latency"
    assert meas.Metrics[0].Unit == "ms"
    assert out.emf.fields["OTelLib"] == "mylib"
    assert out.emf.value == 1.5
    assert out.emf._aws.Timestamp == 1600000000000
    assert '"CloudWatchMetrics"' in out.emf_json


def test_emf_single_label_dedup_edge_case(spark):
    # single label + rollup active -> the full set is skipped (:297-304)
    out = emf_events(_dp(spark, {"a": "1"})).collect()[0]
    dims = [list(d) for d in out.emf._aws.CloudWatchMetrics[0].Dimensions]
    assert dims == [["OTelLib"], ["OTelLib", "a"]]
    # but with NO rollup the full set stays
    out2 = emf_events(_dp(spark, {"a": "1"}), rollup=NO_ROLLUP).collect()[0]
    assert [list(d) for d in
            out2.emf._aws.CloudWatchMetrics[0].Dimensions] == \
        [["a", "OTelLib"]]


def test_emf_namespace_fallbacks_and_config(spark):
    r = emf_events(_dp(spark, {}, svc="only-svc", ns=None)).collect()[0]
    assert r.emf._aws.CloudWatchMetrics[0].Namespace == "only-svc"
    r2 = emf_events(_dp(spark, {}, svc=None, ns=None)).collect()[0]
    assert r2.emf._aws.CloudWatchMetrics[0].Namespace == "default"
    r3 = emf_events(_dp(spark, {}), namespace="Custom/NS").collect()[0]
    assert r3.emf._aws.CloudWatchMetrics[0].Namespace == "Custom/NS"


def test_emf_no_iln_and_single_only(spark):
    out = emf_events(_dp(spark, {"a": "1", "b": "2"}, iln=None),
                     rollup=SINGLE_ONLY).collect()[0]
    dims = [list(d) for d in out.emf._aws.CloudWatchMetrics[0].Dimensions]
    # no OTelLib dimension anywhere; no zero rollup in SINGLE_ONLY
    assert dims == [["a", "b"], ["a"], ["b"]]
    assert "OTelLib" not in dict(out.emf.fields)


def test_emf_invalid_rollup(spark):
    with pytest.raises(ValueError):
        emf_events(_dp(spark, {}), rollup="nope")


def test_emf_preexisting_otellib_label_is_overwritten(spark):
    # labels already carrying OTelLib must not crash map_concat
    out = emf_events(_dp(spark, {"OTelLib": "stale", "a": "1"})).collect()[0]
    assert out.emf.fields["OTelLib"] == "mylib"
