"""Combiner-style per-group top-k: shuffle O(partitions·groups·k),
never O(rows).

A window `row_number() <= k` sorts and shuffles EVERY row of the
group — at 10^12 rows with k=5 that is 10^12 shuffled rows for a
5-row answer.  The combiner shape pre-reduces each input partition to
its own per-group top-k (a bounded pandas reduction inside one Arrow
hop), so the exchange carries at most partitions·groups·k rows; the
final per-group selection then runs over that tiny set.  Exactly the
map-side-combine idea, applied to order statistics.

Determinism: ties on the order key are broken by the id column
ascending — both stages and the DuckDB twin use the identical
(key DESC, id ASC) order, so results are reproducible and
oracle-checkable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def _partition_topk(group_cols: list[str], order_col: str, id_col: str,
                    k: int, ascending: bool):
    def gen(it):
        held: list[pd.DataFrame] = []
        for pdf in it:
            if len(pdf):
                held.append(pdf)
            # re-reduce periodically so partition state stays bounded
            if sum(len(p) for p in held) >= 200_000:
                held = [_reduce(pd.concat(held, ignore_index=True))]
        if held:
            yield _reduce(pd.concat(held, ignore_index=True))

    def _reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        s = pdf.sort_values([order_col, id_col],
                            ascending=[ascending, True],
                            kind="mergesort")
        return s.groupby(group_cols, sort=False).head(k)
    return gen


def topk_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                   id_col: str, k: int, ascending: bool = False
                   ) -> DataFrame:
    """k extreme rows per group by ``order_col`` (desc by default),
    ties broken by ``id_col`` asc.  Two stages: partition-local
    pre-reduce (one Arrow hop, bounded memory), then the exact
    selection over the ≤ partitions·groups·k survivors."""
    pre = df.mapInPandas(
        _partition_topk(group_cols, order_col, id_col, k, ascending),
        schema=df.schema)
    order = [F.col(order_col).asc() if ascending
             else F.col(order_col).desc(), F.col(id_col).asc()]
    win = Window.partitionBy(*group_cols).orderBy(*order)
    return (pre.withColumn("_rk", F.row_number().over(win))
            .filter(F.col("_rk") <= k).drop("_rk"))


def topk_per_group_sql(src: str, group_sql: str, order_sql: str,
                       id_sql: str, k: int, cols_sql: str,
                       ascending: bool = False) -> str:
    """DuckDB twin (single window — the oracle runs at test scale)."""
    direction = "ASC" if ascending else "DESC"
    return f"""SELECT {cols_sql} FROM (
  SELECT *, row_number() OVER (
      PARTITION BY {group_sql}
      ORDER BY {order_sql} {direction}, {id_sql} ASC) AS rk
  FROM {src}) WHERE rk <= {k}"""
