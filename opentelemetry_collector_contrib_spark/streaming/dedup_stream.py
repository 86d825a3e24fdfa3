"""Incremental (cross-micro-batch) exact dedup as a stateful streaming op.

An LLM-corpus ingest pipeline rarely sees its data at rest: shards
arrive continuously, and a document ingested yesterday must suppress
today's byte-identical copy.  The batch operator
(datapipe/dedup.py ``exact_dedup``) re-shuffles the full corpus every
run; this module is the streaming re-expression: the seen-set lives in
the Structured Streaming STATE STORE, hash-partitioned by the dedup
key, and each micro-batch shuffles only its own rows.  This is the
same pump-with-persistent-state shape as the reference's stanza
pipeline (receiver/filelogreceiver reading an ever-growing directory;
offsets/knownFiles state in stanza/operator/builtin/input/file/
read_to_end semantics) — but keyed by content digest, not file offset.

Two paths:

- ``streaming_drop_duplicates`` — Spark's built-in ``dropDuplicates``
  (optionally ``dropDuplicatesWithinWatermark``): the production
  default when only the survivors matter.  State is managed by the
  built-in dedup operator; a watermark bounds it in event-time mode.
- ``dedup_stream`` — ``applyInPandasWithState``: same survivor
  semantics plus a per-key duplicate counter carried in state (the
  collector's dropped-rows observability — the exporters count what
  they drop, e.g. sumologicexporter sender.go dropped-records — which
  the built-in operator cannot surface).

Survivor contract (matches the batch operator's ``policy="min_id"``):
the emitted survivor for a key is the min ``id_col`` among that key's
rows in the FIRST micro-batch where the key appears; every later
occurrence (same batch or any later batch) is counted, not emitted.

Scale: state is one entry per DISTINCT key, partitioned across
executors by the groupBy — the state store (RocksDB-backed in prod)
keeps the seen-set off-heap and checkpointed; there is no driver-side
set and no broadcast, so the operator survives 10^12-key corpora the
same way the batch hash-groupBy does: by sharding.  Restart resumes
from the checkpoint with the seen-set intact (the offsets/resume
manifest analog, plans/manifest.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "key string, survivor_id string, n_batch long, n_seen_before long"
STATE_SCHEMA = "n_seen long"


def streaming_drop_duplicates(df: DataFrame, keys: list[str],
                              watermark_col: str | None = None,
                              delay: str | None = None) -> DataFrame:
    """Built-in path: keep the first row per key across micro-batches.

    With ``watermark_col``+``delay`` the state is bounded: a key older
    than the watermark is forgotten (dropDuplicatesWithinWatermark), the
    right trade for time-windowed dedup (e.g. crawler re-fetch storms);
    without it, state grows with distinct keys — exact global dedup.
    """
    if watermark_col is not None:
        return (df.withWatermark(watermark_col, delay or "10 minutes")
                .dropDuplicatesWithinWatermark(keys))
    return df.dropDuplicates(keys)


def _keep_first_counting(id_col: str):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (k,) = key
        seen_before = int(state.get[0]) if state.exists else 0
        # hot-key safe: a key receiving 10^6 rows in one micro-batch
        # must not materialize 10^6 ids in the Python worker — fold
        # each Arrow chunk into a running (count, min) instead, so
        # working memory is O(1) per key regardless of batch skew.
        n_ids = 0
        min_id = None
        for pdf in pdfs:
            if len(pdf):
                n_ids += len(pdf)
                chunk_min = pdf[id_col].min()
                if min_id is None or chunk_min < min_id:
                    min_id = chunk_min
        state.update((seen_before + n_ids,))
        if seen_before == 0 and n_ids:
            # first micro-batch this key appears in: emit ONE survivor
            yield pd.DataFrame({
                "key": [k],
                "survivor_id": [str(min_id)],
                "n_batch": [n_ids],
                "n_seen_before": [0],
            })
        else:
            # duplicates only — counted in state, nothing emitted
            yield pd.DataFrame({
                "key": pd.Series([], dtype="object"),
                "survivor_id": pd.Series([], dtype="object"),
                "n_batch": pd.Series([], dtype="int64"),
                "n_seen_before": pd.Series([], dtype="int64"),
            })
    return fn


def dedup_stream(df: DataFrame, key_col: str = "digest",
                 id_col: str = "doc_id") -> DataFrame:
    """Stateful streaming exact dedup with duplicate accounting.

    Input: a streaming DataFrame with ``key_col`` (content digest) and
    ``id_col``.  Output (append mode): one row per DISTINCT key, emitted
    in the first micro-batch the key arrives, carrying the survivor id
    and the in-batch occurrence count; later occurrences update the
    per-key ``n_seen`` state and emit nothing.  The state-store entry is
    a single long per key — constant-size state regardless of how often
    the key recurs.
    """
    return (df.select(F.col(key_col).alias("key"), F.col(id_col))
            .groupBy("key")
            .applyInPandasWithState(
                _keep_first_counting(id_col),
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
