"""Gap-based sessionization: split each key's event stream into
sessions separated by > ``gap_ms`` of inactivity.

The reference buffers spans per trace until a wait_duration of
inactivity elapses (processor/groupbytraceprocessor/processor.go:
124-170 — the event-driven "no new span for N seconds -> release"
timer); gap sessionization is the batch re-expression: instead of a
wall-clock timer per trace, the gap between CONSECUTIVE event times
decides the session boundary, so the whole corpus sessionizes in one
deterministic pass.

Shape: ONE shuffle (hash by key) + in-partition sort shared by both
window functions (lag and running sum collapse into a single Window
physical node — same partitioning, same ordering).  State per row is
O(1); no buffering of whole sessions.  This survives 10^12 events:
the shuffle is keyed by the session key (user/trace), the sort is
within-partition and spillable, and the output is one row per event
(session assembly is the caller's downstream groupBy).

Determinism: ties on the timestamp are broken by ``tiebreak`` so any
engine assigns identical session numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize"]


def sessionize(df: DataFrame, key: str, time_ms: str, gap_ms: int,
               tiebreak: str) -> DataFrame:
    """Assign ``session_no`` (0-based per key) to every row.

    A new session starts at the first event of a key and at every
    event whose gap from the previous event is STRICTLY greater than
    ``gap_ms`` (an event exactly gap_ms later is the same session —
    the inactivity timer had not yet fired).
    """
    w = Window.partitionBy(key).orderBy(F.col(time_ms).asc(),
                                        F.col(tiebreak).asc())
    prev = F.lag(time_ms).over(w)
    is_new = F.when(prev.isNull()
                    | ((F.col(time_ms) - prev) > F.lit(gap_ms)), 1
                    ).otherwise(0)
    run = (Window.partitionBy(key)
           .orderBy(F.col(time_ms).asc(), F.col(tiebreak).asc())
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn("session_no",
                         (F.sum(is_new).over(run) - 1).cast("bigint"))
