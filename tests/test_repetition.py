"""Gopher repetition rules (datapipe/repetition.py, arXiv:2112.11446
table A1 second half): crafted boundary docs, coverage-union
semantics, DuckDB-twin parity, and the single-hop plan pin."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.repetition import (
    _features_py, _FIELDS, repetition_rules, repetition_filter,
    repetition_oracle_sql)


def _vals(text):
    return dict(zip(_FIELDS, _features_py(text)))


def test_dup_line_and_char_fracs():
    text = "alpha\nbeta\nalpha\ngamma"
    v = _vals(text)
    # 4 lines, 3 distinct -> 1/4 slots duplicated
    assert v["dup_line_frac"] == 0.25
    # chars: 5+4+5+5=19 all, distinct 5+4+5=14 -> 5/19
    assert v["dup_line_char_frac"] == pytest.approx(5 / 19)
    # one paragraph (no blank line) -> no dup
    assert v["dup_para_frac"] == 0.0


def test_dup_para_frac_ignores_blank_padding():
    text = "para one\n\npara two\n\npara one\n\n   \n"
    v = _vals(text)
    assert v["dup_para_frac"] == pytest.approx(1 / 3)


def test_top_ngram_char_frac():
    # "spam ham" repeated: the top 2-gram covers most characters
    text = " ".join(["spam", "ham"] * 20)
    v = _vals(text)
    assert v["top2_char_frac"] > 0.4
    # a no-repetition doc: a count-1 "top gram" is no signal -> 0.0
    clean = "the quick brown fox jumps over lazy dogs tonight"
    assert _vals(clean)["top2_char_frac"] == 0.0


def test_dup_ngram_coverage_is_a_union():
    # every 5-gram of a pure repeat is duplicated; overlapping
    # occurrences must union to AT MOST the whole doc, never more
    text = " ".join(["loop"] * 30)
    v = _vals(text)
    assert v["dup5_char_frac"] == 1.0
    for f in _FIELDS:
        assert 0.0 <= v[f] <= 1.0


def test_short_and_empty_docs_zero():
    assert all(x == 0.0 for x in _features_py(""))
    v = _vals("only four words here")
    assert v["dup5_char_frac"] == 0.0 and v["top4_char_frac"] == 0.0


def test_rules_and_filter(spark):
    docs = spark.createDataFrame(
        [(1, "x\n" * 40 + "tail"),                      # dup lines
         (2, "the quick brown fox jumps over the lazy dog and then "
             "some more genuinely varied text follows here today")],
        "doc_id int, text string")
    out = {r["doc_id"]: r.asDict()
           for r in repetition_rules(docs).collect()}
    assert not out[1]["repetition_pass"]
    assert not out[1]["r_dup_line_frac"]
    assert out[2]["repetition_pass"]
    kept = repetition_filter(docs).collect()
    assert [r["doc_id"] for r in kept] == [2]
    assert set(kept[0].asDict()) == {"doc_id", "text"}


def test_duckdb_twin_parity():
    rows = [
        (1, "alpha\nbeta\nalpha\ngamma"),
        (2, "para one\n\npara two\n\npara one"),
        (3, " ".join(["spam", "ham"] * 20)),
        (4, " ".join(["loop"] * 30)),
        (5, "the quick brown fox jumps over the lazy dog today and "
            "tomorrow with friends"),
        (6, ""),
        (7, "only four words here"),
        (8, "\n\n".join(f"p{i % 3} body text" for i in range(9))),
        (9, " ".join(f"w{i % 11}" for i in range(200))),
        (10, "a b c d e f g h i j " * 5),
    ]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows,
                                           columns=["doc_id", "text"]))
    got = con.execute(
        "WITH " + repetition_oracle_sql()
        + " SELECT * FROM rvals ORDER BY doc_id").fetchdf()
    for _, row in got.iterrows():
        want = _features_py(dict(rows)[int(row["doc_id"])])
        for f, w in zip(_FIELDS, want):
            assert row[f] == pytest.approx(round(w, 6), abs=1e-9), \
                (row["doc_id"], f)


def test_single_arrow_hop_plan(spark):
    docs = spark.createDataFrame([(1, "t")], "doc_id int, text string")
    plan = (repetition_rules(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
