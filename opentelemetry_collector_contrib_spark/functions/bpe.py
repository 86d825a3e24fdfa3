"""Byte-level BPE tokenizer: train on a sample, apply distributed.

The input contract (BASELINE.json input_hint) is PRE-tokenized
sequences; this module is the other half of that pipeline — producing
``tokens: array<int32>`` from raw text at corpus scale, GPT-2-style:

- base vocabulary = the 256 bytes (ids 0..255), so NOTHING is ever
  out-of-vocabulary and decode reproduces the input byte-exactly;
- merge i creates token id 256+i;
- text splits into whitespace-preserving chunks (``\\s+`` / ``\\S+``),
  merges never cross a chunk boundary (the BPE word-boundary rule);
  concatenating decoded chunks restores the exact original string.

Scale shape:
- training is driver-side over a bounded deterministic sample
  (industry practice: the merge table is a few kB of model state; a
  10^12-row corpus is not re-counted per merge);
- apply is one Arrow hop; the per-chunk merge loop runs ONLY over the
  batch's UNIQUE chunks, memoized in an executor-lifetime cache
  (module global) — Zipf means the cache hit rate approaches 1 after
  the first batches, so per-row Python work amortizes to a dict
  lookup per chunk.
"""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CHUNK_RE = re.compile(rb"\s+|\S+")
BASE_VOCAB = 256


def _chunks(text: bytes) -> list[bytes]:
    return _CHUNK_RE.findall(text)


def train_bpe(texts, n_merges: int) -> list[tuple[int, int]]:
    """Learn ``n_merges`` merges from sample ``texts``.  Deterministic:
    ties break on the smaller (left, right) id pair.  Returns the
    merge list [(left_id, right_id), ...]; merge i mints id 256+i."""
    freqs = Counter()
    for t in texts:
        for c in _chunks(t.encode("utf-8")):
            freqs[tuple(c)] += 1
    words = {w: list(w) for w in freqs}
    merges: list[tuple[int, int]] = []
    for m in range(n_merges):
        pairs = Counter()
        for w, seq in words.items():
            f = freqs[w]
            for a, b in zip(seq, seq[1:]):
                pairs[(a, b)] += f
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], (-kv[0][0],
                                                          -kv[0][1])))[0]
        merges.append(best)
        new_id = BASE_VOCAB + m
        for w, seq in words.items():
            words[w] = _merge_seq(seq, best, new_id)
    return merges


def _merge_seq(seq: list[int], pair: tuple[int, int],
               new_id: int) -> list[int]:
    out, i, n = [], 0, len(seq)
    while i < n:
        if i + 1 < n and seq[i] == pair[0] and seq[i + 1] == pair[1]:
            out.append(new_id)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def _encode_chunk(c: bytes, ranks: dict) -> list[int]:
    seq = list(c)
    while len(seq) > 1:
        best_rank, best_pair = None, None
        for a, b in zip(seq, seq[1:]):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (a, b)
        if best_pair is None:
            break
        seq = _merge_seq(seq, best_pair, BASE_VOCAB + best_rank)
    return seq


def vocab_bytes(merges) -> list[bytes]:
    """id -> byte string (decode table): 256 single bytes + merges."""
    v = [bytes([i]) for i in range(BASE_VOCAB)]
    for a, b in merges:
        v.append(v[a] + v[b])
    return v


def encode_text(text: str, merges) -> list[int]:
    """Driver/test-side single-string encode (same code path as the
    UDF, no cache)."""
    ranks = {p: i for i, p in enumerate(merges)}
    out: list[int] = []
    for c in _chunks(text.encode("utf-8")):
        out.extend(_encode_chunk(c, ranks))
    return out


def decode_tokens(ids, merges) -> str:
    v = vocab_bytes(merges)
    return b"".join(v[i] for i in ids).decode("utf-8")


# executor-lifetime chunk cache, keyed by the merges identity so two
# different tokenizers in one executor don't cross-contaminate
_CACHE: dict = {}


def bpe_encode_udf(merges: list[tuple[int, int]]):
    mkey = tuple(map(tuple, merges))
    ranks = {p: i for i, p in enumerate(mkey)}

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(text: pd.Series) -> pd.Series:
        cache = _CACHE.setdefault(mkey, {})
        out = []
        for t in text:
            ids: list[int] = []
            for c in _chunks(t.encode("utf-8")):
                got = cache.get(c)
                if got is None:
                    got = cache[c] = _encode_chunk(c, ranks)
                ids.extend(got)
            out.append(ids)
        return pd.Series(out, index=text.index, dtype=object)
    return enc


def bpe_decode_udf(merges: list[tuple[int, int]]):
    v = vocab_bytes(merges)

    @F.pandas_udf(T.StringType())
    def dec(ids: pd.Series) -> pd.Series:
        return pd.Series(
            [b"".join(v[i] for i in row).decode("utf-8") for row in ids],
            index=ids.index, dtype=object)
    return dec
