"""Composed tokens-native curation cascade
(datapipe/token_curation.py): funnel semantics, equivalence to the
chained stand-alone stages, and span-removal wiring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.token_curation import (
    tokens_curation_pipeline, tokens_digest)

TEMPLATE = list(range(100, 130))


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # near-identical templated docs (fuzzy-dup cluster, min id survives)
    for i, tail in enumerate([900, 901, 902]):
        rows.append((f"near-{i}", "app", TEMPLATE + [tail]))
    # exact duplicates (keep-first)
    rows.append(("exact-a", "app", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]))
    rows.append(("exact-b", "app", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]))
    # degenerate: fails the quality gate (one-token run)
    rows.append(("stuck", "app", [7] * 40))
    # healthy unrelated docs
    for i in range(4):
        base = 2000 + 137 * i
        rows.append((f"ok-{i}", "app", [base + 11 * j for j in range(25)]))
    return spark.createDataFrame(
        rows, "doc_id string, source string, tokens array<int>")


def test_funnel_and_survivors(corpus):
    out, obs = tokens_curation_pipeline(corpus, minhash_threshold=0.3,
                                        k_gram=4, span_n=13)
    rows = {r["doc_id"]: r for r in out.collect()}
    funnel = {k: o.get["n"] for k, o in obs.items()}
    assert funnel["input"] == 10
    assert funnel["quality_pass"] == 9          # 'stuck' gated out
    assert funnel["exact_unique"] == 8          # 'exact-b' deduped
    assert funnel["fuzzy_unique"] == len(rows)
    # monotone funnel
    assert (funnel["input"] >= funnel["quality_pass"]
            >= funnel["exact_unique"] >= funnel["fuzzy_unique"])
    # fuzzy cluster collapses to its min id
    assert "near-0" in rows
    assert "near-1" not in rows and "near-2" not in rows
    assert "exact-a" in rows and "exact-b" not in rows
    assert "stuck" not in rows
    # survivors' sequences are untouched by span removal (no cross-doc
    # duplicated 13-gram remains among survivors) and split is present
    assert all(r["n_removed"] == 0 for r in rows.values())
    assert all(r["split"] in ("train", "val") for r in rows.values())


def test_span_removal_wiring(spark):
    """Two surviving docs sharing a 13-token span (but not near-dups)
    get the shared span REMOVED from both."""
    shared = list(range(500, 513))
    a = shared + [i * 31 + 7 for i in range(30)]
    b = [i * 37 + 11 for i in range(30)] + shared
    df = spark.createDataFrame(
        [("a", "s", a), ("b", "s", b)],
        "doc_id string, source string, tokens array<int>")
    out, _ = tokens_curation_pipeline(df, minhash_threshold=0.9,
                                      k_gram=4, span_n=13)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_removed"] == 13 and rows["b"]["n_removed"] == 13
    assert rows["a"]["tokens"] == a[13:]
    assert rows["b"]["tokens"] == b[:-13]


def test_remove_spans_false_keeps_arrays(corpus):
    out, _ = tokens_curation_pipeline(corpus, minhash_threshold=0.3,
                                      k_gram=4, remove_spans=False)
    orig = {r["doc_id"]: r["tokens"] for r in corpus.collect()}
    for r in out.collect():
        assert r["tokens"] == orig[r["doc_id"]]
        assert r["n_removed"] == 0


def test_digest_matches_oracle_serialization(spark):
    """tokens_digest must equal md5(array_to_string(tokens, ',')) —
    the serialization every tokens oracle uses."""
    import duckdb
    df = spark.createDataFrame(
        [("x", [3, -1, 40000])], "doc_id string, tokens array<int>")
    got = df.select(tokens_digest("tokens").alias("d")).collect()[0]["d"]
    con = duckdb.connect()
    want = con.sql(
        "SELECT md5(array_to_string([3, -1, 40000]::INT[], ','))"
    ).fetchone()[0]
    con.close()
    assert got == want
