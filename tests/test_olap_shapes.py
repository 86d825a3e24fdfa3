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
