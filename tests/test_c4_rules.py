"""C4 cleaning rules (datapipe/c4_rules.py, arXiv:1910.10683 §2.2):
line-keep predicate, page flags, cleaned-text substitution, DuckDB
parity, and the single-hop plan pin."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.c4_rules import (
    DEFAULT_BADWORDS, _features_py, c4_filter, c4_oracle_sql, c4_rules)


def _f(text, **kw):
    names = ("kept_text", "n_lines", "n_kept", "n_sentences",
             "has_lorem", "has_brace", "has_badword")
    return dict(zip(names, _features_py(
        text, kw.get("min_words", 5),
        frozenset(kw.get("badwords", DEFAULT_BADWORDS)))))


def test_line_keep_predicate():
    doc = ("This is a proper sentence with enough words.\n"
           "short line.\n"                        # < 5 words
           "no terminal punctuation here at all\n"
           "Enable javascript to view this page today.\n"   # javascript
           'He said "This ends with a quote."\n'
           "Trailing spaces still count as terminal.   ")
    v = _f(doc)
    assert v["n_lines"] == 6 and v["n_kept"] == 3
    assert "short line." not in v["kept_text"]
    assert "javascript" not in v["kept_text"]
    assert v["kept_text"].endswith("terminal.   ")


def test_page_flags_and_keep(spark):
    docs = spark.createDataFrame(
        [(1, "A good long sentence number one here.\n"
             "A good long sentence number two here.\n"
             "A good long sentence number three here."),
         (2, "Lorem Ipsum dolor sit amet is filler text here.\n"
             "Another fine long sentence lives right here.\n"
             "And a third fine long sentence sits here."),
         (3, "A page with code tokens like { inside it stays out.\n"
             "Another fine long sentence lives right here.\n"
             "And a third fine long sentence sits here."),
         (4, "Only two proper sentences survive in this page.\n"
             "Here is the second and final full sentence.")],
        "doc_id int, text string")
    out = {r["doc_id"]: r.asDict() for r in c4_rules(docs).collect()}
    assert out[1]["c4_keep"]
    assert out[2]["has_lorem"] and not out[2]["c4_keep"]
    assert out[3]["has_brace"] and not out[3]["c4_keep"]
    assert out[4]["n_sentences"] == 2 and not out[4]["c4_keep"]


def test_badword_is_word_match_not_substring():
    # 'sex' as a word trips the flag; inside 'sussex' it must NOT
    clean = "The county of Sussex has lovely rolling green hills."
    assert not _f(clean)["has_badword"]
    dirty = "This page mentions sex explicitly in some sentence."
    assert _f(dirty)["has_badword"]
    # punctuation-stripped word form still matches
    edged = 'They whispered "sex." and the filter still catches it.'
    assert _f(edged)["has_badword"]


def test_filter_substitutes_cleaned_text(spark):
    docs = spark.createDataFrame(
        [(1, "A good long sentence number one here.\n"
             "dropme\n"
             "A good long sentence number two here.\n"
             "A good long sentence number three here.")],
        "doc_id int, text string")
    kept = c4_filter(docs).collect()
    assert len(kept) == 1
    assert "dropme" not in kept[0]["text"]
    assert set(kept[0].asDict()) == {"doc_id", "text"}


def test_duckdb_twin_parity():
    rows = [
        (1, "This is a proper sentence with enough words.\nshort.\n"
            "no terminal here at all\nsaid \"quoted end.\""),
        (2, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
            "A second fine long sentence lives right here."),
        (3, "Code page with a brace { and some long prose here.\n"
            "Another fine long sentence right here after it."),
        (4, "The county of Sussex has lovely rolling hills.\n"
            "They whispered \"sex.\" and the filter catches it."),
        (5, ""),
        (6, "Exclamations work too! Do questions work? Yes they do.\n"
            "Enable javascript to continue reading this article."),
    ]
    con = duckdb.connect()
    con.register("documents",
                 pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = con.execute(
        "WITH " + c4_oracle_sql()
        + " SELECT * FROM c4v ORDER BY doc_id").fetchdf()
    for _, row in got.iterrows():
        want = _features_py(dict(rows)[int(row["doc_id"])], 5,
                            frozenset(DEFAULT_BADWORDS))
        assert row["kept_text"] == want[0], row["doc_id"]
        assert row["n_lines"] == want[1] and row["n_kept"] == want[2]
        assert row["n_sentences"] == want[3]
        assert bool(row["has_lorem"]) == want[4]
        assert bool(row["has_brace"]) == want[5]
        assert bool(row["has_badword"]) == want[6], row["doc_id"]


def test_single_arrow_hop_plan(spark):
    docs = spark.createDataFrame([(1, "t")], "doc_id int, text string")
    plan = (c4_rules(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
