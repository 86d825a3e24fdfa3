"""Rollup / pivot / inverted-index invariants on a tiny corpus (the
oracle gate checks full values at sf0.01; these pin the semantics)."""

from pyspark.sql import functions as F

from conftest import rows

DOCS = [
    (1, "alpha beta", "en", "src0", 10),
    (2, "alpha", "en", "src1", 5),
    (3, "beta gamma beta", "de", "src0", 15),
]


def _docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, lang string, source string, n_chars long")


def test_rollup_levels_are_consistent(spark):
    d = _docs_df(spark)
    out = (d.rollup("lang", "source")
           .agg(F.count(F.lit(1)).alias("n"))
           .select(F.coalesce("lang", F.lit("(all)")).alias("lang"),
                   F.coalesce("source", F.lit("(all)")).alias("source"), "n"))
    got = {(r[0], r[1]): r[2] for r in rows(out)}
    # leaves
    assert got[("en", "src0")] == 1 and got[("en", "src1")] == 1
    assert got[("de", "src0")] == 1
    # lang subtotals and grand total
    assert got[("en", "(all)")] == 2 and got[("de", "(all)")] == 1
    assert got[("(all)", "(all)")] == 3


def test_pivot_counts_with_explicit_values(spark):
    d = _docs_df(spark)
    out = (d.groupBy("source").pivot("lang", ["en", "de", "zh"])
           .agg(F.count(F.lit(1))).na.fill(0, ["en", "de", "zh"]))
    got = {r[0]: (r[1], r[2], r[3]) for r in rows(out)}
    assert got == {"src0": (1, 1, 0), "src1": (1, 0, 0)}


def test_inverted_index_df_counts_each_doc_once(spark):
    from opentelemetry_collector_contrib_spark.datapipe.dedup import norm_words
    d = _docs_df(spark)
    w = d.select("doc_id",
                 F.explode(F.array_distinct(norm_words(F.col("text"))))
                  .alias("word"))
    got = {r[0]: r[1]
           for r in rows(w.groupBy("word").agg(F.count(F.lit(1)).alias("df")),
                         "word", "df")}
    # 'beta' appears twice in doc 3 but counts once per doc
    assert got == {"alpha": 2, "beta": 2, "gamma": 1}


def test_inverted_index_constant_state_under_hot_word(spark):
    """Round-2 verdict item 5: the posting fingerprint must be a
    commutative constant-state aggregate — a 50%-frequency word makes
    ONE row whose value is a bounded checksum, never a collected
    posting list.  Twin-checked against a Python sum of the same
    per-(word, doc) portable hashes, and the plan must show map-side
    partial aggregation."""
    import hashlib

    from opentelemetry_collector_contrib_spark.queries_ext import (
        inverted_index_summary)

    n = 400
    docs = [(i, "hotword filler%d" % i if i % 2 == 0 else "filler%d" % i,
             "en", "s", 10) for i in range(n)]
    d = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = inverted_index_summary(d)
    got = {r["word"]: r for r in out.collect()}
    hot = got["hotword"]
    assert hot["df"] == n // 2
    assert (hot["min_doc"], hot["max_doc"]) == (0, n - 2)

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    twin = sum(h(f"hotword:{i}") for i in range(0, n, 2))
    assert hot["posting_md5"] == hashlib.md5(str(twin).encode()).hexdigest()

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("HashAggregate") >= 2        # partial + final
    assert "CollectList" not in plan and "collect_list" not in plan
