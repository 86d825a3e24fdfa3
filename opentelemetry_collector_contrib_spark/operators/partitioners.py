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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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

    Compiled to a bucketized lookup: the sorted ring positions become a
    literal array; the index is found with binary-search-free
    ``aggregate`` over boundaries — O(ring) per row but fully codegen,
    and ring size is bounded (endpoints*100)."""
    ring = build_ring(endpoints)
    positions = [p for p, _ in ring]
    owners = [e for _, e in ring]
    h = F.pmod(F.crc32(key.cast("binary")), F.lit(RING_POSITIONS))
    # index of first position >= h = count of positions < h (ring is
    # sorted); count == size means wrap to 0.  Pure codegen, O(ring).
    pos_arr = F.array(*[F.lit(p) for p in positions])
    idx = F.size(F.filter(pos_arr, lambda x: x < h))
    idx = F.when(idx >= F.size(pos_arr), F.lit(0)).otherwise(idx)
    owner_arr = F.array(*[F.lit(o) for o in owners])
    return F.element_at(owner_arr, idx + 1)


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
