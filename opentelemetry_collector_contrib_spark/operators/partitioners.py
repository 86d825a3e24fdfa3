"""Partitioning / fan-out operators.

- batchperresourceattr (pkg/batchperresourceattr/batchperresourceattr.go:
  131-164): split one batch into per-attribute-value batches.  Spark:
  ``repartition(col)`` (shuffle-by-key) or ``partitionBy`` on write;
  the <=1-distinct-value passthrough fast path (40-43) is Catalyst's
  job — repartition on a constant column is a single-partition noop
  under AQE coalescing.
- loadbalancingexporter consistent hash ring (consistent_hashing.go:
  44-68, 109-149): Karger-style crc32 ring with 100 virtual points per
  backend over 36000 positions, routing each trace id to a backend.
  Spark analog: deterministic hash-bucket assignment.  We reproduce the
  ring semantics exactly (for parity tests) as a column expression over
  a precomputed ring table — the ring is tiny (endpoints × 100), so it
  broadcasts as a literal CASE/array; at scale this is pure codegen.
- salting for hot keys (north rule): ``salted_repartition``.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RING_POSITIONS = 36000     # consistent_hashing.go:28 (maxPositions)
VPOINTS = 100              # consistent_hashing.go:27 (defaultWeight)


def build_ring(endpoints: list[str]) -> list[tuple[int, str]]:
    """consistent_hashing.go:109-149: position = crc32(endpoint + i) %
    RING_POSITIONS for i in 0..VPOINTS, sorted by position."""
    ring: list[tuple[int, str]] = []
    for ep in endpoints:
        for i in range(VPOINTS):
            pos = zlib.crc32(f"{ep}-{i}".encode()) % RING_POSITIONS
            ring.append((pos, ep))
    ring.sort()
    return ring


def ring_route_column(key: Column, endpoints: list[str]) -> Column:
    """Backend for a key per the ring lookup (consistent_hashing.go:44-68:
    first ring position >= hash(key) % RING_POSITIONS, wrapping).

    crc32 + pmod stay JVM-side (codegen); the position->owner lookup is
    ONE Arrow hop over a single int column with a vectorized binary
    search (np.searchsorted) over the precomputed ring.  The earlier
    expression form (F.filter over a 400-literal array) was an
    interpreted HOF — O(ring) comparisons per row with no codegen."""
    ring = build_ring(endpoints)
    positions = np.array([p for p, _ in ring], dtype=np.int64)
    owners = np.array([e for _, e in ring], dtype=object)

    @F.pandas_udf(T.StringType())
    def _ring_lookup(h: pd.Series) -> pd.Series:
        # first index with positions[idx] >= h; == len -> wrap to 0.
        # Sorted-duplicate positions resolve to the first (same as the
        # reference's linear scan over the sorted ring).
        idx = np.searchsorted(positions, h.to_numpy(), side="left")
        idx[idx >= len(positions)] = 0
        return pd.Series(owners[idx])

    h = F.pmod(F.crc32(key.cast("binary")), F.lit(RING_POSITIONS))
    return _ring_lookup(h)


CRC32_POLY = 0xEDB88320        # reflected IEEE 802.3 polynomial


def crc32_table() -> list[int]:
    """The standard 256-entry byte-at-a-time CRC-32 table (same values
    zlib.crc32 uses) — inlined as literals into the DuckDB oracle so the
    ring route is hash-checkable without a native crc32 function."""
    tab = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ CRC32_POLY if c & 1 else c >> 1
        tab.append(c)
    return tab


def batch_per_attr(df: DataFrame, attr: str, n_partitions: int | None = None) -> DataFrame:
    """Shuffle-by-key split (batchperresourceattr.go:131-164)."""
    return df.repartition(n_partitions or df.sparkSession.sparkContext.defaultParallelism,
                          F.col(attr))


def salted_repartition(df: DataFrame, key: str, n_partitions: int,
                       salt_buckets: int = 16, seed: int = 7) -> DataFrame:
    """Deterministic salted repartition for hot keys (north rule): the
    salt derives from a row-unique column hash, so re-runs place rows
    identically (no rand() — resume-safe)."""
    salt = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(seed)), F.lit(salt_buckets))
    return df.repartition(n_partitions, F.col(key), salt)


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 16, salt_from: str | None = None,
                how: str = "inner", seed: int = 7) -> DataFrame:
    """Skew-proof big-to-medium equi-join: salt the big side, replicate
    the small side.

    When one join key holds a large share of the big side (the 62%-hot
    ``source`` of this corpus), a plain shuffle join lands that share
    on ONE reducer.  AQE's skew split covers sort-merge joins after the
    fact; this is the explicit, planner-independent form the north
    rule names: the big side gets a deterministic salt in
    [0, salt_buckets) derived from a row-unique column, the small side
    is replicated once per salt value (an O(|small| x buckets) explode
    — 'medium' side must tolerate the fan-out), and the join key
    becomes (key, salt), spreading each hot key over salt_buckets
    reducers.  Join RESULTS are salt-invariant (asserted in tests).
    """
    b = salted_big_side(big, salt_buckets, salt_from, seed)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in
                                     range(salt_buckets)])))
    return b.join(s, [key, "_salt"], how).drop("_salt")


def salted_big_side(big: DataFrame, salt_buckets: int = 16,
                    salt_from: str | None = None,
                    seed: int = 7) -> DataFrame:
    """The big side of :func:`salted_join` with its ``_salt`` column
    attached — THE salt derivation (xxhash64 over a row-unique column,
    pmod into [0, salt_buckets)).  Exposed so tests can assert on the
    operator's actual pre-drop salt grouping instead of re-deriving
    the formula (a drifted re-derivation would mask a regression)."""
    salt_col = F.col(salt_from) if salt_from else F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in big.columns])
    return big.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_col, F.lit(seed)),
                        F.lit(salt_buckets)).cast("int"))
