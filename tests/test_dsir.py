"""DSIR importance resampling (datapipe/dsir.py, arXiv:2302.03169)."""

import math

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.dsir import (
    bucket, dsir_resample, fit_log_ratios, importance_weights,
    dsir_oracle_sql)
from opentelemetry_collector_contrib_spark.datapipe.quality_clf import (
    grams_py)
from opentelemetry_collector_contrib_spark.datapipe.dedup import (
    _norm_words_py)

EN = ["the cat sat on the mat and the dog slept",
      "a cat and a dog met on the mat",
      "the dog and the cat share the mat again"]
DE = ["der hund schlief auf der matte neben der katze",
      "eine katze und ein hund auf der matte"]


def _docs(spark):
    rows = [(i, t, "en") for i, t in enumerate(EN)] + \
           [(100 + i, t, "de") for i, t in enumerate(DE)]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_weights_favor_target_like_docs(spark):
    docs = _docs(spark)
    out = importance_weights(docs, docs.filter(F.col("lang") == "en"))
    w = {r["id"]: r["logw"] for r in out.collect()}
    avg_en = sum(w[i] for i in range(len(EN))) / len(EN)
    avg_de = sum(w[100 + i] for i in range(len(DE))) / len(DE)
    assert avg_en > avg_de


def test_flagged_one_pass_fit_matches_two_pass(spark):
    """fit_log_ratios_flagged (ONE explode+agg when target ⊆ raw) must
    produce the exact model of the two-frame fit — same counts, same
    scalar-libm ln composition — and importance_weights(target_flag=)
    must be value-identical to the two-frame call."""
    from opentelemetry_collector_contrib_spark.datapipe.dsir import (
        fit_log_ratios_flagged)
    docs = _docs(spark)
    two = fit_log_ratios(docs, docs.filter(F.col("lang") == "en"))
    one = fit_log_ratios_flagged(docs, F.col("lang") == "en")
    assert one == two                          # bit-identical floats
    a = sorted(map(tuple, importance_weights(
        docs, docs.filter(F.col("lang") == "en")).collect()))
    b = sorted(map(tuple, importance_weights(
        docs, target_flag=(F.col("lang") == "en")).collect()))
    assert a == b


def test_weights_match_python_model(spark):
    """The distributed fit (two count aggregations + closure scoring)
    equals the single-machine model computed straight from the
    definition."""
    docs = _docs(spark)
    out = {r["id"]: (r["n_grams"], r["logw"])
           for r in importance_weights(
               docs, docs.filter(F.col("lang") == "en")).collect()}
    texts = EN + DE
    ids = list(range(len(EN))) + [100 + i for i in range(len(DE))]
    B = 8192
    tc, rc = {}, {}
    for t, is_t in [(t, t in EN) for t in texts]:
        for g in grams_py(_norm_words_py(t)):
            b = bucket(g)
            rc[b] = rc.get(b, 0) + 1
            if is_t:
                tc[b] = tc.get(b, 0) + 1
    nt, nr = sum(tc.values()), sum(rc.values())
    for i, t in zip(ids, texts):
        gs = grams_py(_norm_words_py(t))
        acc = 0.0
        for g in gs:
            b = bucket(g)
            acc += (math.log((tc.get(b, 0) + 1) / (nt + B))
                    - math.log((rc.get(b, 0) + 1) / (nr + B)))
        assert out[i][0] == len(gs)
        assert abs(out[i][1] - acc) < 1e-12, i


def test_zero_gram_doc_scores_zero(spark):
    docs = spark.createDataFrame([(0, "the cat", "en"), (1, "", "en")],
                                 "doc_id long, text string, lang string")
    out = {r["id"]: (r["n_grams"], r["logw"])
           for r in importance_weights(docs, docs).collect()}
    assert out[1] == (0, 0.0)


def test_fit_is_bucket_bounded(spark):
    llr = fit_log_ratios(_docs(spark), _docs(spark), n_buckets=64)
    assert len(llr) == 64
    # p == q when target == raw, so every ratio is exactly 0
    assert all(x == 0.0 for x in llr)


def test_resample_deterministic_and_biased(spark):
    docs = _docs(spark)
    scored = importance_weights(docs, docs.filter(F.col("lang") == "en"))
    # a dominating weight is always selected at k=1
    boosted = scored.withColumn(
        "logw", F.when(F.col("id") == 2, 1e6).otherwise(F.col("logw")))
    a = [r["id"] for r in dsir_resample(boosted, 1).collect()]
    b = [r["id"] for r in dsir_resample(boosted, 1).collect()]
    assert a == b == [2]
    got = dsir_resample(scored, 3).collect()
    assert len(got) == 3


def test_scoring_plan_is_one_arrow_hop(spark):
    docs = _docs(spark)
    out = importance_weights(docs, docs.filter(F.col("lang") == "en"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan and "Join" not in plan


def test_resample_is_combiner_shaped(spark):
    """The global top-k must be the partition-local combiner (shuffle
    O(partitions·k)), never a single-partition window over all rows."""
    docs = _docs(spark)
    scored = importance_weights(docs, docs.filter(F.col("lang") == "en"))
    plan = (dsir_resample(scored, 2)._jdf.queryExecution()
            .executedPlan().toString())
    # the pre-reduce Arrow hop runs before any exchange-to-one
    assert "FlatMapGroupsInPandas" in plan or "MapInPandas" in plan
