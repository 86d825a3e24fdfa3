"""Syslog (RFC 5424/3164) and stanza csv_parser goldens."""

from opentelemetry_collector_contrib_spark.operators.json_parser import (
    csv_parser)
from opentelemetry_collector_contrib_spark.operators.syslog import (
    parse_syslog)


def _parse(spark, lines):
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)],
                               "id int, line string")
    return {r["id"]: r.asDict() for r in parse_syslog(df).collect()}


def test_rfc5424_full_line(spark):
    out = _parse(spark, [
        '<165>1 2003-10-11T22:14:15.003Z mymachine.example.com '
        'evntslog 12 ID47 [exampleSDID@32473 iut="3" '
        'eventSource="Application"] BOMAn application event'])
    r = out[0]
    assert r["format"] == "rfc5424"
    assert r["facility"] == 20 and r["severity"] == 5
    assert r["severity_name"] == "notice"
    assert r["hostname"] == "mymachine.example.com"
    assert r["app"] == "evntslog" and r["procid"] == "12"
    assert r["msgid"] == "ID47"
    assert r["sd"]["iut"] == "3"
    assert r["sd"]["eventSource"] == "Application"
    assert r["msg"] == "BOMAn application event"


def test_rfc5424_nil_fields(spark):
    out = _parse(spark, ["<0>1 2020-01-01T00:00:00Z - - - - - m"])
    r = out[0]
    assert r["facility"] == 0 and r["severity"] == 0
    assert r["severity_name"] == "emerg"
    assert r["hostname"] is None and r["procid"] is None
    assert r["msgid"] is None and r["sd"] is None
    assert r["msg"] == "m"


def test_rfc3164_with_and_without_pid(spark):
    out = _parse(spark, [
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",
        "<13>Feb  5 17:32:18 10.0.0.99 myproc: Use the BFG!"])
    a, b = out[0], out[1]
    assert a["format"] == "rfc3164"
    assert a["facility"] == 4 and a["severity"] == 2
    assert a["severity_name"] == "crit"
    assert a["app"] == "su" and a["procid"] == "230"
    assert a["msg"] == "'su root' failed"
    assert a["ts_s"] == "Oct 11 22:14:15"
    # double-space single-digit day normalizes, no pid -> NULL
    assert b["ts_s"] == "Feb 5 17:32:18"
    assert b["app"] == "myproc" and b["procid"] is None


def test_unparseable_kept_flagged(spark):
    out = _parse(spark, ["not syslog at all", ""])
    assert out[0]["format"] is None and out[0]["msg"] is None
    assert out[1]["format"] is None


def test_csv_parser_quoting_and_malformed(spark):
    df = spark.createDataFrame(
        [(0, 'a,"b, with ""quote""",3,4.5'), (1, "plain,txt,1,2"),
         (2, "short,row")],
        "id int, body string")
    out = {r["id"]: r.asDict()
           for r in csv_parser(
               df, "w string, x string, y int, z double").collect()}
    assert out[0]["parsed"] and out[0]["x"] == 'b, with "quote"'
    assert out[0]["y"] == 3 and out[0]["z"] == 4.5
    assert out[1]["parsed"]
    assert not out[2]["parsed"] and out[2]["y"] is None


def test_parsers_are_pure_jvm(spark):
    df = spark.createDataFrame([(0, "x")], "id int, line string")
    plan = parse_syslog(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan
    df2 = spark.createDataFrame([(0, "a,b")], "id int, body string")
    plan2 = (csv_parser(df2, "a string, b string")
             ._jdf.queryExecution().executedPlan().toString())
    assert "EvalPython" not in plan2 and "Exchange" not in plan2
