"""alibabacloudlogservice exporter analog — KV flattening goldens."""

from opentelemetry_collector_contrib_spark.sinks.alibaba import (
    logservice_rows)

_SCHEMA = ("body string, ts_ns long, severity_number int, "
           "severity_text string, name string, flags int, "
           "trace_id string, span_id string, attrs map<string,string>, "
           "resource map<string,string>, lib_name string, "
           "lib_version string")


def _row(body="b", ts=5_000_000_000, attrs=None, resource=None, flags=255):
    return (body, ts, 9, "INFO", "n", flags, "t1", "s1", attrs or {},
            resource or {}, "lib", "2.0")


def test_logservice_flattening(spark):
    rows = [
        _row(resource={"host.name": "h1", "service.name": "s",
                       "zone": "z", "area": "a"},
             attrs={"zz": "1", "aa": "2"}),
        _row(body=None),                       # NULL body dropped
        _row(ts=0),                            # now() fallback -> NULL
    ]
    df = spark.createDataFrame(rows, _SCHEMA)
    got = logservice_rows(df).collect()
    assert len(got) == 2
    first = got[0].asDict()
    assert first["host"] == "h1" and first["service"] == "s"
    # sorted-key JSON, host/service excluded from the resource blob
    assert first["resource_json"] == '{"area":"a","zone":"z"}'
    assert first["attribute_json"] == '{"aa":"2","zz":"1"}'
    assert first["flags"] == "ff"
    assert first["time_sec"] == 5
    assert first["time_unix_nano"] == "5000000000"
    second = got[1].asDict()
    assert second["time_sec"] is None          # ts==0: not reproducible
    assert second["host"] == "" and second["resource_json"] == "{}"
