"""dynatraceexporter analog — normalization/escape/float quirks."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sinks.dynatrace import (
    dynatrace_lines, escape_dimension, normalize_string, serialize_float)


def _one(spark, expr, s):
    return spark.createDataFrame([(s,)], ["x"]).select(
        expr(F.col("x")).alias("y")).collect()[0]["y"]


def test_normalize_string_rules(spark):
    # serialization.go:153-171
    cases = {
        "just.fine-name": "just.fine-name",
        "has spaces/and:stuff": "has_spaces_and_stuff",
        "._42drop.me": "drop.me",          # TrimLeft "._0123456789"
        "trailing___": "trailing",
        "__123__": None,                   # empty after trims → error
        "A!!B": "A_B",                     # run of disallowed → ONE _
    }
    for raw, want in cases.items():
        assert _one(spark, lambda c: normalize_string(c, 250), raw) == want
    # truncation happens BEFORE the trailing-underscore strip
    assert _one(spark, lambda c: normalize_string(c, 5), "abcd_ef") == "abcd"


def test_escape_dimension_reference_order(spark):
    # serialization.go:148-151: quotes escaped first, then ALL
    # backslashes (including the just-added ones) doubled
    assert _one(spark, escape_dimension, 'a"b') == 'a\\\\"b'.join(['"', '"'])
    assert _one(spark, escape_dimension, "a\\b") == '"a\\\\b"'
    assert _one(spark, escape_dimension, "plain") == '"plain"'


def test_serialize_float_trim_quirk(spark):
    # serialization.go:173-180 incl. the char-set TrimRight quirk
    cases = {1.5: "1.5", 0.0: "0", 100.0: "1", 10.25: "10.25",
             0.000001: "0.000001", 83.434: "83.434"}
    for raw, want in cases.items():
        assert _one(spark, serialize_float, float(raw)) == want


def _dp(name, dtype, vi=None, vd=None, hs=None, hsi=None, hc=None,
        ts_ns=1_000_000_000, labels=None):
    return (name, dtype, vi, vd, hs, hsi, hc, ts_ns, labels or {})


_SCHEMA = ("name string, dtype string, value_i long, value_d double, "
           "hist_sum double, hist_sum_i long, hist_count long, "
           "ts_ns long, labels map<string,string>")


def test_lines_prefix_tags_and_drops(spark):
    df = spark.createDataFrame([
        _dp("cpu load", "gauge_int", vi=7,
            labels={"Host": "h1", "__": "skipme"}),
        _dp("_9", "gauge_double", vd=1.5),              # invalid name → drop
        _dp("lat", "hist_double", hs=3.0, hc=2),
        _dp("lat", "hist_double", hs=9.0, hc=0),        # poisons ALL "lat"
        _dp("ok.hist", "hist_int", hsi=19, hc=2),
    ], _SCHEMA)
    got = {r["line"] for r in
           dynatrace_lines(df, prefix="pre", tags=("src=x",)).collect()}
    assert got == {
        'pre.cpu_load,src=x,host="h1" 7 1000',
        # int-hist: avg=9.5 float-formatted, sum stays integer
        "pre.ok.hist,src=x gauge,min=9.5,max=9.5,sum=19,count=2 1000",
    }


def test_lines_no_prefix_no_tags(spark):
    df = spark.createDataFrame(
        [_dp("m", "sum_double", vd=2.0)], _SCHEMA)
    got = dynatrace_lines(df).collect()[0]["line"]
    assert got == "m 2 1000"
