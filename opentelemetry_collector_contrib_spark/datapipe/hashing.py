"""Portable deterministic hashing shared by Spark and the DuckDB oracle.

Spark's xxhash64/hash and DuckDB's hash() disagree, so every dedup /
LSH operator that needs oracle-checkable results uses an md5-derived
32-bit integer hash that both engines compute identically:

    H(s) = int(md5(s)[0:8], 16)          # in [0, 2^32)

and the classic universal-hash family h_i(x) = (a_i*x + b_i) mod p
with p = 2^31 - 1 and fixed (a_i, b_i) (seeded, committed below).

At 100 TB scale md5-per-shingle is heavier than xxhash64 but still
JVM-side codegen (no Python); a production deployment would swap in
xxhash64 via ``H_IMPL='xxhash'`` and lose only oracle portability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = (1 << 31) - 1

# fixed universal-hash coefficients (generated once from seed 1234,
# committed as literals so Spark and the oracle agree forever)
_A = [1103515245, 1103527590, 29943829, 1119291809, 1191729, 1000000007,
      69069, 1664525, 22695477, 134775813, 214013, 16807,
      48271, 69621, 40692, 40014]
_B = [12345, 1013904223, 1, 2531011, 1049089, 7,
      362437, 1, 1013904223, 5, 2531011, 0,
      11, 23, 31, 43]

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS


def portable_hash(col: Column) -> Column:
    """H(s): first 8 md5 hex digits as a bigint — same in DuckDB."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")


def portable_hash_sql(col_sql: str) -> str:
    return f"CAST(('0x' || substr(md5(CAST({col_sql} AS VARCHAR)), 1, 8)) AS BIGINT)"


def minhash_expr(h: Column, i: int) -> Column:
    """h_i(H) = (a_i*H + b_i) mod p as a Spark column."""
    return (h * _A[i] + _B[i]) % MERSENNE_P


def minhash_sql(h_sql: str, i: int) -> str:
    return f"(({h_sql}) * {_A[i]} + {_B[i]}) % {MERSENNE_P}"
