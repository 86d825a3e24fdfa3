"""Gopher rule battery (datapipe/quality_rules.py, arXiv:2112.11446
table A1): crafted documents hit each rule's boundary independently."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.quality_rules import (
    gopher_filter, gopher_rules)

GOOD = ("the quick brown fox jumps over that lazy dog and it keeps "
        "going with more plain prose to have enough words of normal "
        "length in this body " * 3)          # 84 words, all alpha


def _run(spark, docs):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    return {r["doc_id"]: r.asDict()
            for r in gopher_rules(df).collect()}


def test_rule_boundaries(spark):
    docs = [
        GOOD,                                     # 0: passes everything
        "short text only",                        # 1: n_words < 50
        " ".join(["a"] * 60),                     # 2: mean_wlen < 3
        GOOD + " " + "#" * 1 + " ###### # # # # # # # # #",  # 3: symbols
        "\n".join(["- item"] * 19 + ["plain"]),   # 4: bullet_frac = 0.95
        "\n".join(["trailing..."] * 2 + ["x"] * 3),  # 5: ellipsis 0.4
        GOOD + " " + " ".join(["123"] * 40),      # 6: alpha_frac low
        " ".join(["lorem", "ipsum"] * 40),        # 7: stop_hits = 0
    ]
    out = _run(spark, docs)
    assert out[0]["gopher_pass"] is True
    assert out[1]["r_words"] is False
    assert out[2]["r_wlen"] is False and out[2]["mean_wlen"] == 1.0
    assert out[3]["r_symbol"] is False
    assert out[4]["r_bullet"] is False and abs(out[4]["bullet_frac"] - 0.95) < 1e-12
    assert out[5]["r_ellipsis"] is False and abs(out[5]["ellipsis_frac"] - 0.4) < 1e-12
    assert out[6]["r_alpha"] is False
    assert out[7]["r_stop"] is False and out[7]["stop_hits"] == 0
    # each failing doc fails overall
    for i in range(1, 8):
        assert out[i]["gopher_pass"] is False, i


def test_symbol_counting_is_nonoverlapping_and_exact(spark):
    # 7 dots = two non-overlapping '...' occurrences (replace-trick rule)
    out = _run(spark, ["w ....... x " + "pad " * 60])
    (row,) = out.values()
    assert row["symbol_ratio"] * row["n_words"] == 2.0


def test_empty_and_null_docs_fail_closed(spark):
    df = spark.createDataFrame([(0, ""), (1, None)],
                               "doc_id long, text string")
    got = gopher_rules(df).select("doc_id", "n_words", "mean_wlen",
                                  "gopher_pass").collect()
    for r in got:
        assert r["n_words"] == 0 and r["mean_wlen"] == 0.0
        assert r["gopher_pass"] is False


def test_gopher_filter_projects_original_schema(spark):
    df = spark.createDataFrame([(0, GOOD, "en"), (1, "tiny", "en")],
                               "doc_id long, text string, lang string")
    kept = gopher_filter(df)
    assert kept.columns == ["doc_id", "text", "lang"]
    assert [r["doc_id"] for r in kept.collect()] == [0]


def test_single_python_stage(spark):
    """The battery is ONE Arrow hop: exactly one ArrowEvalPython in the
    plan, no exchange."""
    df = spark.createDataFrame([(0, GOOD)], "doc_id long, text string")
    plan = (gopher_rules(df)._jdf.queryExecution().executedPlan()
            .toString())
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan
