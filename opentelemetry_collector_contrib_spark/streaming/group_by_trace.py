"""groupbytrace as a custom stateful streaming operator.

Reference: processor/groupbytraceprocessor/processor.go:29-53 (design),
124-170 (buffer + wait_duration timer), 256-304 (splitByTrace): spans
are buffered per trace id from first arrival; ``wait_duration`` after
that first arrival the whole trace is released downstream as one batch.

Structured-Streaming re-expression with ``applyInPandasWithState``:
state per trace id holds the buffered spans; a processing-time timeout
set at first arrival plays the wait_duration timer; on timeout the
trace is emitted and state cleared.  (The batch analog is a plain
groupBy + collect_list — SURVEY §2.7; this module is the streaming
path with real state + timers.)

Ring-buffer capacity (processor.go num_traces eviction) maps to
``spark.sql.streaming.statefulOperator.*`` memory controls rather than
explicit eviction — state stores spill and are bounded by watermark
cleanup in event-time mode.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = ("trace_id string, n_spans int, span_ids array<string>, "
                 "complete boolean")
STATE_SCHEMA = "span_ids array<string>, deadline long"


def _buffer_and_release(wait_duration_ms: int, max_spans: int | None = None):
    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (trace_id,) = key
        if state.hasTimedOut:
            # wait_duration elapsed -> release the buffered trace
            (span_ids, _deadline) = state.get
            state.remove()
            yield pd.DataFrame({"trace_id": [trace_id],
                                "n_spans": [len(span_ids)],
                                "span_ids": [list(span_ids)],
                                "complete": [True]})
            return
        # the reference arms the timer at FIRST arrival
        # (processor.go:128-139); later spans must NOT extend it.  But
        # Spark's GroupState contract CLEARS the timeout on every
        # invocation that carries new data, so the first-arrival
        # deadline is persisted in state and the timeout re-armed to
        # that same absolute deadline on every call — otherwise a trace
        # whose spans span >1 micro-batch would never time out (silent
        # data loss + unbounded state).
        now = state.getCurrentProcessingTimeMs()
        if state.exists:
            buffered: list[Any] = list(state.get[0])
            deadline = int(state.get[1])
        else:
            buffered = []
            deadline = now + wait_duration_ms
        for pdf in pdfs:
            buffered.extend(pdf["span_id"].tolist())
        if max_spans is not None and len(buffered) >= max_spans:
            # hot-trace eviction (processor.go num_traces ring-buffer
            # analog): a runaway trace_id (instrumentation bug, id
            # collision) must not grow one state entry without bound.
            # Release NOW, flagged incomplete, and clear state — later
            # spans of the same trace start a fresh buffer, so state
            # per key stays <= max_spans + one micro-batch's worth.
            state.remove()
            yield pd.DataFrame({"trace_id": [trace_id],
                                "n_spans": [len(buffered)],
                                "span_ids": [buffered],
                                "complete": [False]})
            return
        state.update((buffered, deadline))
        state.setTimeoutDuration(max(deadline - now, 1))
        yield pd.DataFrame({"trace_id": pd.Series([], dtype="object"),
                            "n_spans": pd.Series([], dtype="int32"),
                            "span_ids": pd.Series([], dtype="object"),
                            "complete": pd.Series([], dtype="bool")})
    return fn


def group_by_trace_stream(spans: DataFrame,
                          wait_duration_ms: int = 1000,
                          max_spans: int | None = None) -> DataFrame:
    """Streaming sessionizer: input needs (trace_id string, span_id
    string) columns; emits one row per released trace.

    ``max_spans`` bounds per-trace state: a trace reaching the cap is
    released immediately with ``complete=False`` (the reference evicts
    from its ring buffer when full, processor.go:124-170 — same
    safety valve, keyed by size instead of trace count)."""
    return (spans
            .groupBy("trace_id")
            .applyInPandasWithState(
                _buffer_and_release(wait_duration_ms, max_spans),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
