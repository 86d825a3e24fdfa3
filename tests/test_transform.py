"""OTTL-style transform-statement DSL."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.transform import (
    parse_statement, transform)

from conftest import rows


def _df(spark):
    return spark.createDataFrame(
        [("d1", "Error", "secret=abc123 msg=hello", 17),
         ("d2", "Info", "msg=world", 9)],
        "doc_id string, severity_text string, body string, severity_number int")


def test_parse_statement():
    st = parse_statement("set(env, 'prod') where severity_number >= 17")
    assert (st.fn, st.args, st.cond) == ("set", ["env", "'prod'"],
                                         "severity_number >= 17")
    st = parse_statement("keep_keys(attrs, 'a', 'b')")
    assert st.args == ["attrs", "'a'", "'b'"]
    with pytest.raises(ValueError):
        parse_statement("not a statement")


def test_set_guarded_and_unguarded(spark):
    out = transform(_df(spark), [
        "set(env, 'prod')",
        "set(alert, severity_number >= 17)",
        "set(severity_text, 'CRIT') where severity_number >= 17",
    ])
    got = {r["doc_id"]: r for r in out.collect()}
    assert got["d1"]["env"] == got["d2"]["env"] == "prod"
    assert got["d1"]["alert"] is True and got["d2"]["alert"] is False
    assert got["d1"]["severity_text"] == "CRIT"
    assert got["d2"]["severity_text"] == "Info"     # untouched


def test_redact_truncate_delete_drop(spark):
    out = transform(_df(spark), [
        r"replace_pattern(body, 'secret=\S+', 'secret=***')",
        "truncate(body, 10) where severity_number < 17",
        "delete(severity_text) where severity_number < 10",
        "drop() where doc_id = 'd2' and false",     # no-op guard
    ])
    got = {r["doc_id"]: r for r in out.collect()}
    assert got["d1"]["body"].startswith("secret=***")
    assert got["d2"]["body"] == "msg=world"[:10]
    assert got["d2"]["severity_text"] is None
    assert got["d1"]["severity_text"] == "Error"

    dropped = transform(_df(spark), ["drop() where severity_number >= 17"])
    assert [r["doc_id"] for r in dropped.collect()] == ["d2"]


def test_keep_keys_and_rename(spark):
    df = _df(spark).withColumn(
        "attrs", F.create_map(F.lit("a"), F.lit("1"),
                              F.lit("b"), F.lit("2"),
                              F.lit("c"), F.lit("3")))
    out = transform(df, ["keep_keys(attrs, 'a', 'c')",
                         "rename(attrs, labels)"])
    row = out.collect()[0]
    assert row["labels"] == {"a": "1", "c": "3"}
    assert "attrs" not in out.columns


def test_transform_in_config_pipeline(spark, sf_dir):
    from opentelemetry_collector_contrib_spark.plans.config import (
        build_from_config, load_config)
    cfg = load_config(f"""
receivers:
  tokens: {{path: {sf_dir}/tokens.parquet}}
processors:
  parse: {{kind: regex_parser}}
  tf:
    kind: transform
    statements:
      - set(env, 'prod')
      - drop() where parsed = false
service:
  pipelines:
    logs:
      receivers: [tokens]
      processors: [parse, tf]
      exporters: []
exporters: {{}}
""")
    out = build_from_config(spark, cfg)
    assert out.filter(F.col("parsed") == False).count() == 0  # noqa: E712
    assert out.select("env").distinct().collect()[0]["env"] == "prod"
