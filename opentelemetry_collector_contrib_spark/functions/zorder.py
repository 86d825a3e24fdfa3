"""Z-order (Morton) interleave for write-time data layout.

At 100 TB the cheapest query is the one that never reads the file:
parquet/Iceberg row-group min-max stats prune scans only when rows
with similar key values are physically adjacent.  Sorting by ONE key
clusters that key alone; interleaving the bits of several keys
(Morton order) keeps EVERY interleaved dimension locally dense, so
filters on any subset of them prune — the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY`.

Spark-first: the key is a pure-Catalyst bit-interleave expression
(whole-stage codegen, no Python), used as
``df.repartitionByRange("z").sortWithinPartitions("z").write...`` so
the shuffle is a single range exchange and files get tight min-max
ranges on all dimensions.

Both inputs are first clamped to ``bits``-wide non-negative ints
(callers bucket raw values: epoch-seconds >> 6, hash % 2^bits, …).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZBITS = 20        # per-dimension bits -> 40-bit key for 2 dims


def zorder2(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Interleave two ``bits``-wide non-negative ints: x gets the even
    bit lanes, y the odd ones.  Expands to 2·bits shift/mask terms —
    all codegen, constant-folded shifts."""
    x = x.cast("long") % (1 << bits)
    y = y.cast("long") % (1 << bits)
    terms = []
    for b in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, b).bitwiseAND(1), 2 * b))
        terms.append(F.shiftleft(F.shiftright(y, b).bitwiseAND(1), 2 * b + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z.bitwiseOR(t)
    return z


def zorder2_sql(x_sql: str, y_sql: str, bits: int = ZBITS) -> str:
    """DuckDB twin (same shift/mask/or chain, BIGINT lanes)."""
    xs = f"(CAST({x_sql} AS BIGINT) % {1 << bits})"
    ys = f"(CAST({y_sql} AS BIGINT) % {1 << bits})"
    terms = []
    for b in range(bits):
        terms.append(f"((({xs} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ys} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " | ".join(terms) + ")"


def deinterleave2(z: int, bits: int = ZBITS) -> tuple[int, int]:
    """Python twin inverse (tests): z -> (x, y)."""
    x = y = 0
    for b in range(bits):
        x |= ((z >> (2 * b)) & 1) << b
        y |= ((z >> (2 * b + 1)) & 1) << b
    return x, y


def write_zordered(df: DataFrame, path: str, x: Column, y: Column,
                   bits: int = ZBITS, partitions: int | None = None
                   ) -> None:
    """Lay out ``df`` in Morton order: one range exchange on the
    interleaved key, per-file local sort, tight min-max stats on both
    dimensions."""
    keyed = df.withColumn("_z", zorder2(x, y, bits))
    rep = (keyed.repartitionByRange(partitions, "_z") if partitions
           else keyed.repartitionByRange("_z"))
    (rep.sortWithinPartitions("_z").drop("_z")
        .write.mode("overwrite").parquet(path))
