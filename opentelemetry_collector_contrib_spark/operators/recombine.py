"""Multiline recombine — stack-trace/continuation-line reassembly.

The reference's stanza receiver registers file/json/regex operators
(receiver/stanzareceiver/register.go:19-22); the stanza ecosystem it
embeds also ships a ``recombine`` operator (combine consecutive lines
of one file into a single entry keyed by an is-first-entry or
is-last-entry predicate — the standard Java/Python stack-trace shape),
and the fileconsumer's ``multiline`` split config
(line_start_pattern/line_end_pattern) expresses the same semantics at
split time.  Implemented here with the stanza contract: ordered lines
in, one combined entry out, predicate either marks entry STARTS
(``mode='first'``) or entry ENDS (``mode='last'``), lines joined with
``sep`` (stanza combine_with, default newline), and ``max_lines``
(stanza max_batch_size) splits oversized entries.

Spark-first shape (scale notes):
- entry ids are a running sum of the predicate over a window keyed by
  the source column — ONE exchange keyed by ``key_cols`` (files are
  many and lines-per-file is bounded by file size, so the key is
  well-spread; a single hot file is a skew problem upstream splitting
  already solves by rolling files);
- the grouped concat then needs clustering by (key, entry_id), which
  hashpartitioning(key) ALREADY satisfies (subset rule) — Catalyst
  inserts NO second exchange (pinned in tests/test_recombine.py);
- line order inside an entry is made explicit by sorting
  (order, tiebreak) structs inside the aggregated array —
  ``collect_list`` order is never relied upon.

Leading continuation lines before the first start-marker (mode
'first') group as entry 0 — the stanza analog is the initial held
batch flushed on its own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def recombine(df: DataFrame, predicate: Column, key_cols: list[str],
              order_col: str, tiebreak: str, line_col: str = "line",
              mode: str = "first", sep: str = "\n",
              max_lines: int | None = None) -> DataFrame:
    """Combine consecutive lines into entries.

    Output: one row per entry — ``key_cols``, ``entry_id`` (0-based
    per key, int64), ``first_<order_col>``, ``n_lines``, ``body``
    (lines joined by ``sep`` in (order, tiebreak) order).
    """
    if mode not in ("first", "last"):
        raise ValueError(f"mode must be 'first' or 'last', got {mode!r}")
    flag = F.when(predicate, F.lit(1)).otherwise(F.lit(0))
    w = (Window.partitionBy(*key_cols)
         .orderBy(F.col(order_col).asc(), F.col(tiebreak).asc()))
    if mode == "first":
        # entry starts AT a marked line: count markers up to and
        # including this row (0 = leading unmarked lines)
        run = F.sum(flag).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    else:
        # entry ends AT a marked line: count markers strictly before
        run = F.coalesce(
            F.sum(flag).over(
                w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0))
    out = df.withColumn("entry_id", run.cast("bigint"))
    if max_lines is not None:
        # stanza max_batch_size: an entry longer than max_lines is
        # emitted in max_lines-sized chunks
        rk = F.row_number().over(
            Window.partitionBy(*key_cols, "entry_id")
            .orderBy(F.col(order_col).asc(), F.col(tiebreak).asc()))
        out = out.withColumn(
            "entry_id",
            F.col("entry_id") * 1_000_000
            + F.floor((rk - 1) / F.lit(max_lines)).cast("bigint"))
    return (out.groupBy(*key_cols, "entry_id")
            .agg(F.min(order_col).alias(f"first_{order_col}"),
                 F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.struct(
                             F.col(order_col).alias("o"),
                             F.col(tiebreak).alias("tb"),
                             F.col(line_col).alias("l")))),
                         lambda s: s["l"]),
                     sep).alias("body")))


def recombine_oracle_sql(src: str, pred_sql: str, key_sql: str,
                         order_sql: str, tiebreak_sql: str,
                         line_sql: str, mode: str = "first",
                         sep: str = "\n") -> str:
    """DuckDB twin: same running-sum entry ids, ordered string_agg.
    (``max_lines`` chunking is pytest-covered, not oracle-needed.)"""
    if mode == "first":
        run = (f"sum(CASE WHEN {pred_sql} THEN 1 ELSE 0 END) OVER "
               f"(PARTITION BY {key_sql} ORDER BY {order_sql}, "
               f"{tiebreak_sql} ROWS BETWEEN UNBOUNDED PRECEDING AND "
               f"CURRENT ROW)")
    else:
        run = (f"coalesce(sum(CASE WHEN {pred_sql} THEN 1 ELSE 0 END) "
               f"OVER (PARTITION BY {key_sql} ORDER BY {order_sql}, "
               f"{tiebreak_sql} ROWS BETWEEN UNBOUNDED PRECEDING AND "
               f"1 PRECEDING), 0)")
    sep_lit = sep.replace("'", "''").replace("\n", "' || chr(10) || '")
    return f"""rc_marked AS (
  SELECT {key_sql} AS rc_key, {order_sql} AS rc_o,
         {tiebreak_sql} AS rc_tb, {line_sql} AS rc_line,
         CAST({run} AS BIGINT) AS entry_id
  FROM {src}
), rc AS (
  SELECT rc_key, entry_id, min(rc_o) AS first_o,
         count(*)::BIGINT AS n_lines,
         string_agg(rc_line, '{sep_lit}' ORDER BY rc_o, rc_tb) AS body
  FROM rc_marked GROUP BY rc_key, entry_id
)"""
