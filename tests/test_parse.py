"""Parse stage: token decode, regex_parser (both backends), severity
table, timestamp layout, kv extract, json parser.

Golden shapes mirror receiver/stanzareceiver/e2e_test.go:59-107 and the
converter type matrix (converter_test.go:111-130)."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.severity import (
    SEVERITY_TABLE, severity_number_expr, severity_text_expr)
from opentelemetry_collector_contrib_spark.functions.timefmt import strptime_to_spark
from opentelemetry_collector_contrib_spark.operators.json_parser import (
    json_parser, splunk_hec_events)
from opentelemetry_collector_contrib_spark.operators.regex_parser import (
    RegexParser, java_pattern, kv_extract)
from opentelemetry_collector_contrib_spark.sources.tokens_source import (
    read_tokens, with_body)

from conftest import rows


LINE = "2020-08-25 05:01:31 INFO hello pod_ip=10.0.1.8"


def _lines_df(spark, lines):
    return spark.createDataFrame([(l,) for l in lines], "body string")


def test_decode_backends_agree(spark, sf_dir):
    df = read_tokens(spark, f"{sf_dir}/tokens.parquet").limit(200)
    nat = with_body(df, backend="native").select("doc_id", "body")
    pan = with_body(df, backend="pandas").select("doc_id", "body")
    assert rows(nat) == rows(pan)


def test_tokens_carried_untouched(spark, sf_dir):
    """The per-row token-array-equality invariant: parse adds columns,
    never rewrites tokens."""
    df = read_tokens(spark, f"{sf_dir}/tokens.parquet").limit(100)
    out = RegexParser().apply(with_body(df))
    before = rows(df.select("doc_id", "tokens"))
    after = rows(out.select("doc_id", "tokens"))
    assert before == after


def test_regex_backends_agree(spark):
    df = _lines_df(spark, [LINE, "--- no match here", ""])
    cols = ["ts", "sev", "msg", "parsed", "severity_text", "severity_number"]
    a = RegexParser(backend="pandas").apply(df).select(cols)
    b = RegexParser(backend="native").apply(df).select(cols)
    assert rows(a) == rows(b)


def test_fused_backend_agrees(spark, sf_dir):
    """fused (tokens -> body+groups, one Arrow hop) == pandas on body."""
    df = read_tokens(spark, f"{sf_dir}/tokens.parquet").limit(300)
    cols = ["doc_id", "body", "ts", "sev", "msg", "parsed",
            "severity_text", "severity_number"]
    fused = RegexParser(backend="fused").apply(df).select(cols)
    pand = RegexParser(backend="pandas").apply(with_body(df)).select(cols)
    assert rows(fused) == rows(pand)


def test_arrow_backend_agrees(spark, sf_dir):
    """arrow (mapInArrow: buffer decode + RE2 extract) == fused
    (pandas UDF: numpy decode + Python-re extract), incl. misses."""
    df = read_tokens(spark, f"{sf_dir}/tokens.parquet").limit(300)
    cols = ["doc_id", "body", "ts", "sev", "msg", "parsed",
            "severity_text", "severity_number"]
    arrow = RegexParser(backend="arrow").apply(df).select(cols)
    fused = RegexParser(backend="fused").apply(df).select(cols)
    assert rows(arrow) == rows(fused)


def test_arrow_backend_falls_back_on_re2_reject():
    """Lookahead is valid Python-re but not RE2 — the parser must fall
    back to the fused backend, not break."""
    p = RegexParser(pattern=r"^(?P<ts>\d+)(?=.)(?P<msg>.*)$",
                    backend="arrow")
    assert p.backend == "fused"


def test_arrow_backend_trailing_newline_matches_python_re(spark):
    """Python-re '$' matches before one trailing newline, RE2's does
    not — the arrow backend strips one trailing \\n for matching so
    both backends agree on newline-terminated lines."""
    lines = [LINE, LINE + "\n", LINE + "\n\n", "2020-08-25 05:01:31 INFO x\nmore"]
    rows_in = [([ord(c) for c in l],) for l in lines]
    df = spark.createDataFrame(rows_in, "tokens array<int>")
    cols = ["body", "ts", "sev", "msg", "parsed"]
    arrow = RegexParser(backend="arrow").apply(df).select(cols)
    fused = RegexParser(backend="fused").apply(df).select(cols)
    assert rows(arrow) == rows(fused)
    got = {r["body"]: r["parsed"] for r in arrow.collect()}
    assert got[LINE + "\n"] is True          # single trailing \n parses
    assert got[LINE + "\n\n"] is False       # double does not (both backends)


def test_arrow_backend_replaces_existing_group_columns(spark):
    """A pre-existing column named like a capture group must be
    REPLACED (fused withColumn semantics), not duplicated."""
    df = spark.createDataFrame(
        [([ord(c) for c in LINE], "OLD")], "tokens array<int>, sev string")
    out = RegexParser(backend="arrow").apply(df)
    assert out.columns.count("sev") == 1
    assert out.collect()[0]["sev"] == "INFO"


def test_regex_named_groups_and_miss(spark):
    out = RegexParser(backend="pandas").apply(_lines_df(spark, [LINE, "nope"]))
    got = {r["body"]: r for r in out.collect()}
    assert got[LINE]["ts"] == "2020-08-25 05:01:31"
    assert got[LINE]["sev"] == "INFO"
    assert got[LINE]["msg"] == "hello pod_ip=10.0.1.8"
    assert got[LINE]["parsed"] is True
    # non-matching lines are flagged, not dropped (stanza errors;
    # we keep-and-flag per FIXTURES §5.3)
    assert got["nope"]["parsed"] is False
    assert got["nope"]["ts"] is None


def test_timestamp_parse(spark):
    out = RegexParser(backend="pandas").apply(_lines_df(spark, [LINE])).collect()[0]
    assert str(out["event_ts"]) == "2020-08-25 05:01:31"


def test_strptime_translation():
    assert strptime_to_spark("%Y-%m-%d %H:%M:%S") == "yyyy-MM-dd HH:mm:ss"
    assert strptime_to_spark("%d/%b/%Y") == "dd/MMM/yyyy"


@pytest.mark.parametrize("sev,text,num", [
    (k, v[0], v[1]) for k, v in SEVERITY_TABLE.items()
])
def test_severity_table(spark, sev, text, num):
    """converter.go:167-217 two-way mapping incl. range bucketing."""
    df = spark.createDataFrame([(sev,)], "s string")
    got = df.select(
        severity_text_expr(F.col("s")).alias("t"),
        severity_number_expr(F.col("s")).alias("n")).collect()[0]
    assert (got["t"], got["n"]) == (text, num)


def test_severity_unknown_is_undefined(spark):
    df = spark.createDataFrame([("WEIRD",)], "s string")
    got = df.select(severity_text_expr(F.col("s")).alias("t"),
                    severity_number_expr(F.col("s")).alias("n")).collect()[0]
    assert (got["t"], got["n"]) == ("Undefined", 0)


def test_kv_extract(spark):
    df = _lines_df(spark, [LINE, "no ip here"])
    got = {r["body"]: r["pod_ip"] for r in kv_extract(df, "pod_ip").collect()}
    assert got[LINE] == "10.0.1.8"
    assert got["no ip here"] is None


def test_java_pattern_strips_named_groups():
    assert java_pattern(r"^(?P<name_0>a)\.(?P<key_b>b)$") == r"^(a)\.(b)$"


def test_json_parser_malformed_kept(spark):
    df = _lines_df(spark, ['{"k": 7, "s": "x"}', "not json"])
    out = json_parser(df, "k int, s string")
    got = {r["body"]: r for r in out.collect()}
    assert got['{"k": 7, "s": "x"}']["k"] == 7
    assert got["not json"]["parsed"] is False


def test_splunk_hec(spark):
    ev = ('{"time":1598313600.5,"host":"h1","source":"s","sourcetype":"st",'
          '"index":"main","event":"hello","fields":{"k":"v"}}')
    out = splunk_hec_events(_lines_df(spark, [ev])).collect()[0]
    # seconds -> ns (splunk_to_logdata.go:54-56)
    assert out["ts_ns"] == 1598313600500000000
    assert out["host"] == "h1"
    assert out["fields"]["k"] == "v"


def test_severity_range_bucketing(spark):
    """Numeric custom levels bucket exactly per converter.go:193-214."""
    from opentelemetry_collector_contrib_spark.functions.severity import (
        convert_severity_level, severity_from_level_expr)
    levels = list(range(-5, 106, 5)) + [33, 47, 101]
    df = spark.createDataFrame([(l,) for l in levels], "lv int")
    got = {r["lv"]: (r["t"], r["n"]) for r in df.select(
        "lv",
        severity_from_level_expr(F.col("lv"), "text").alias("t"),
        severity_from_level_expr(F.col("lv"), "number").alias("n")).collect()}
    for l in levels:
        assert got[l] == convert_severity_level(l), l
    assert got[100] == ("Fatal", 24)
    assert got[95] == ("Fatal", 22)
    assert got[33] == ("Info", 10)
    assert got[5] == ("Trace", 1)
    assert got[0] == ("Undefined", 0)
    assert got[-5] == ("Undefined", 0)


def test_out_of_range_timestamp_flagged_not_crash(spark):
    """A regex-matching line with an impossible date must yield NULL
    event_ts (ANSI to_timestamp would throw and kill the job)."""
    bad = "2020-13-45 99:99:99 ERROR impossible date"
    out = RegexParser(backend="pandas").apply(
        _lines_df(spark, [bad, LINE])).collect()
    got = {r["body"]: r["event_ts"] for r in out}
    assert got[bad] is None
    assert got[LINE] is not None
