"""Exact-substring dedup removal (dedup.remove_dup_spans, the Lee et
al. 2021 removal step applied to token arrays)."""

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.dedup import (
    remove_dup_spans, token_ngram_profile)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def test_shared_span_removed_from_both_docs(spark):
    shared = list(range(100, 105))
    rows = [(0, [1, 2, 3] + shared + [7, 8, 9]),
            (1, [20, 21] + shared + [30])]
    out = {r["id"]: r for r in remove_dup_spans(_df(spark, rows), n=5)
           .collect()}
    assert list(out[0]["kept"]) == [1, 2, 3, 7, 8, 9]
    assert list(out[1]["kept"]) == [20, 21, 30]
    assert out[0]["n_removed"] == 5 and out[1]["n_removed"] == 5


def test_unique_docs_untouched(spark):
    rows = [(0, list(range(30))), (1, list(range(100, 140)))]
    out = remove_dup_spans(_df(spark, rows), n=5).collect()
    assert all(r["n_removed"] == 0 for r in out)
    assert {r["id"]: len(r["kept"]) for r in out} == {0: 30, 1: 40}


def test_overlapping_spans_merge(spark):
    # two overlapping duplicated 4-grams in doc 0 cover 5 tokens, not 8
    core = [5, 6, 7, 8, 9]
    rows = [(0, [1] + core + [2]),
            (1, core[:4] + [99, 98]),     # shares gram (5,6,7,8)
            (2, [97] + core[1:] + [96])]  # shares gram (6,7,8,9)
    out = {r["id"]: r for r in remove_dup_spans(_df(spark, rows), n=4)
           .collect()}
    assert list(out[0]["kept"]) == [1, 2]
    assert out[0]["n_removed"] == 5


def test_removed_count_matches_profile_coverage(spark):
    rows = [(0, [1, 2, 3, 4, 5, 6, 7, 8]),
            (1, [9, 3, 4, 5, 6, 10, 11, 12]),
            (2, list(range(50, 70)))]
    n = 4
    prof = {r["id"]: r["covered_tokens"]
            for r in token_ngram_profile(_df(spark, rows), n=n).collect()}
    rem = {r["id"]: r["n_removed"]
           for r in remove_dup_spans(_df(spark, rows), n=n).collect()}
    assert prof == rem


def test_short_docs_survive(spark):
    rows = [(0, [1, 2]), (1, []), (2, [1, 2])]
    out = {r["id"]: r for r in remove_dup_spans(_df(spark, rows), n=13)
           .collect()}
    # below gram length: nothing can be duplicated at 13-gram level
    assert out[0]["n_removed"] == 0 and out[1]["n_removed"] == 0
    assert list(out[1]["kept"]) == []
