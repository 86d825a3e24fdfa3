"""Byte-level BPE (functions/bpe.py): exact round-trip on arbitrary
unicode, deterministic training, compression on repetitive text, the
executor chunk cache, and Spark-side encode/decode parity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.functions.bpe import (
    BASE_VOCAB, bpe_decode_udf, bpe_encode_udf, decode_tokens,
    encode_text, train_bpe, vocab_bytes)

from conftest import rows

SAMPLE = ["the cat sat on the mat", "the bat and the rat chat",
          "log line with pod_ip=10.0.0.1 and seq=42",
          "ünïcødé — テキスト mixed"]


def test_round_trip_exact_including_whitespace():
    merges = train_bpe(SAMPLE, 50)
    for t in SAMPLE + ["  leading  and \t tabs \n newlines  ",
                       "unseen ξζω bytes ok"]:
        assert decode_tokens(encode_text(t, merges), merges) == t


def test_training_is_deterministic_and_compresses():
    m1, m2 = train_bpe(SAMPLE, 50), train_bpe(SAMPLE, 50)
    assert m1 == m2
    t = SAMPLE[0]
    assert len(encode_text(t, m1)) < len(t.encode())


def test_vocab_bytes_reconstructs_merges():
    merges = train_bpe(SAMPLE, 20)
    v = vocab_bytes(merges)
    assert v[:BASE_VOCAB] == [bytes([i]) for i in range(256)]
    for i, (a, b) in enumerate(merges):
        assert v[BASE_VOCAB + i] == v[a] + v[b]


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=120))
def test_property_round_trip_any_unicode(t):
    merges = train_bpe(SAMPLE, 30)
    assert decode_tokens(encode_text(t, merges), merges) == t


def test_spark_encode_decode_parity(spark):
    merges = train_bpe(SAMPLE, 40)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(SAMPLE)],
                               "i int, text string")
    enc, dec = bpe_encode_udf(merges), bpe_decode_udf(merges)
    out = (df.withColumn("toks", enc("text"))
             .withColumn("back", dec("toks")))
    got = rows(out, "i", "text", "back", "toks")
    for i, text, back, toks in got:
        assert back == text
        assert toks == encode_text(text, merges)   # UDF == driver twin


def test_merges_never_cross_chunk_boundary():
    """A space chunk and a word chunk stay separate tokens even when
    'e ' would be the most frequent pair."""
    merges = train_bpe(["e e e e e e e e"], 10)
    v = vocab_bytes(merges)
    for tok in v[BASE_VOCAB:]:
        assert not (b" " in tok and tok.strip()), tok
