"""Distributed sketches: HyperLogLog cardinality + count-min frequency.

At 10^12 rows, "how many distinct X" and "how often does Y occur" are
the profiling questions every training-data pipeline asks, and exact
answers need a full shuffle of the key space.  Both sketches here
reduce that to O(sketch) state with ONE partial-aggregating exchange:

- HLL: 2^b registers per group; the shuffle carries at most
  groups × 2^b max-rho rows (map-side combined), never the keys.
- CMS: d×w counters per group; frequency probes are a broadcast
  lookup, no second scan of the corpus.

Spark ships approx_count_distinct (HLL++) and count_min_sketch
built-ins; this implementation instead derives every register from
the committed md5 hash family (hashing.py) so the DuckDB oracle can
replay the sketch bit-for-bit — including the estimator: the HLL
indicator sum Z = Σ 2^-M[j] is computed as the INTEGER
Σ 2^(53-M[j]) (each term a dyadic rational · 2^53; 2^b terms ≤ 2^61
fits BIGINT), so no float accumulation order can diverge between
engines.  The only FP ops are one division and (in the small-range
branch) one ln, rounded to 6 digits like every float oracle here.

Register math (classic Flajolet HLL, b bucket bits over a 60-bit
md5 hash — 15 hex digits keeps the value positive in a signed 64-bit
lane on both engines, the simhash 60-bit trick):

    h   = int(md5(key)[0:15], 16)        # 60 bits
    j   = h % 2^b                        # bucket
    w   = h >> b                         # (60-b)-bit suffix
    rho = (60-b) - bitlen(w) + 1         # leading zeros + 1; w=0 -> 61-b

``bitlen(w) = length(bin(w))`` — Spark and DuckDB agree (verified,
incl. bin(0) = '0' of length 1, which the w=0 CASE bypasses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import MERSENNE_P, _A, _B

HLL_B = 8                      # bucket bits -> m = 256 registers
HLL_M = 1 << HLL_B
HLL_WBITS = 60 - HLL_B         # suffix width
HLL_RMAX = HLL_WBITS + 1       # rho when the suffix is all zeros

CMS_D = 4                      # hash rows (reuses committed (a_i,b_i))
CMS_W = 256                    # counters per row

#: 60-bit md5 hash — Spark / DuckDB twins.
H60 = "CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT)"
H60_SQL = "CAST(('0x' || substr(md5({col}), 1, 15)) AS BIGINT)"

ALPHA_SQL = ("CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) "
             f"+ CAST(1.079 AS DOUBLE) / {HLL_M})")


def hll_register_cols(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one key — pure Catalyst, codegen-friendly."""
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    j = h % HLL_M
    w = F.shiftright(h, HLL_B)
    rho = (F.when(w == 0, F.lit(HLL_RMAX))
           .otherwise(F.lit(HLL_RMAX) - F.length(F.bin(w))))
    return j.alias("hll_j"), rho.alias("hll_rho")


def hll_estimate(df: DataFrame, key_col: str, *group_cols: str) -> DataFrame:
    """Distinct-count estimate per group: one partial-agg exchange
    carrying ≤ groups×m register rows, then an O(m) rollup.
    (The indicator sum is integer-exact — see module docstring —
    and F.shiftleft only takes a literal bit count, hence the SQL
    spelling in the tail.)"""
    return hll_estimate_from_registers(
        hll_registers(df, key_col, *group_cols), *group_cols)


def hll_estimate_sql(corpus: str, key_sql: str, group_sql: str) -> str:
    """DuckDB twin of hll_estimate over ``corpus`` (a CTE providing
    the key and group columns)."""
    h = H60_SQL.format(col=key_sql)
    return f"""regs AS (
  SELECT {group_sql} AS grp, ({h}) % {HLL_M} AS j,
         max(CASE WHEN ({h}) // {1 << HLL_B} = 0 THEN {HLL_RMAX}
                  ELSE {HLL_RMAX}
                       - length(bin(({h}) // {1 << HLL_B})) END) AS mj
  FROM {corpus} GROUP BY grp, j),
hll AS (
  SELECT grp,
         CAST(sum(CAST(1 AS BIGINT) << ({HLL_RMAX} - mj)) AS BIGINT)
           AS z_used,
         count(*) AS n_regs
  FROM regs GROUP BY grp),
est AS (
  SELECT grp,
    CAST(z_used + ({HLL_M} - n_regs)
         * (CAST(1 AS BIGINT) << {HLL_RMAX}) AS DOUBLE) AS z,
    CAST({HLL_M} - n_regs AS DOUBLE) AS v
  FROM hll),
final AS (
  SELECT grp,
    {ALPHA_SQL} * CAST({HLL_M * HLL_M} AS DOUBLE)
      * CAST({1 << HLL_RMAX} AS DOUBLE) / z AS raw, v
  FROM est)
"""


def hll_registers(df: DataFrame, key_col: str,
                  *group_cols: str) -> DataFrame:
    """The mergeable state: (group, j, mj) register rows.  Persist
    per run; union + re-max merges runs for free (the sketch
    property that makes incremental corpus profiling O(m) per run)."""
    j, rho = hll_register_cols(F.col(key_col))
    return (df.select(*group_cols, j, rho)
            .groupBy(*group_cols, "hll_j")
            .agg(F.max("hll_rho").alias("mj")))


def hll_merge(*register_dfs: DataFrame) -> DataFrame:
    """Union register tables from independent runs and re-max —
    exactly equivalent to sketching the concatenated corpora."""
    out = register_dfs[0]
    for d in register_dfs[1:]:
        out = out.unionByName(d)
    keys = [c for c in out.columns if c not in ("mj",)]
    return out.groupBy(*keys).agg(F.max("mj").alias("mj"))


def hll_estimate_from_registers(regs: DataFrame,
                                *group_cols: str) -> DataFrame:
    """Finish an estimate from (merged) register rows — same math as
    hll_estimate's tail."""
    z_term = F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_RMAX} - mj)")
    agg = (regs.groupBy(*group_cols)
           .agg(F.sum(z_term).alias("z_used"),
                F.count(F.lit(1)).alias("n_regs")))
    two53 = F.lit(1 << HLL_RMAX).cast("long")
    z = (F.col("z_used")
         + (F.lit(HLL_M) - F.col("n_regs")) * two53).cast("double")
    v = (F.lit(HLL_M) - F.col("n_regs")).cast("double")
    alpha = F.expr(ALPHA_SQL)
    raw = alpha * F.lit(float(HLL_M * HLL_M)) * two53.cast("double") / z
    small = F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v)
    est = F.when((raw <= F.lit(2.5 * HLL_M)) & (v > 0), small) \
           .otherwise(raw)
    return agg.select(*group_cols, F.round(est, 6).alias("hll_est"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """CMS merge = counter-wise sum (linearity of the counters)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "pos").agg(F.sum("cnt").alias("cnt"))


def cms_position_rows(key: Column) -> Column:
    """array<struct<i,pos>> of the d counter coordinates for a key."""
    from .hashing import portable_hash
    h = portable_hash(key)
    return F.array(*[
        F.struct(F.lit(i).alias("i"),
                 ((h * _A[i] + _B[i]) % MERSENNE_P % CMS_W).alias("pos"))
        for i in range(CMS_D)])


def cms_build(df: DataFrame, key_col: str) -> DataFrame:
    """The d×w counter table: one exchange, ≤ d·w output rows."""
    return (df.select(F.explode(cms_position_rows(F.col(key_col)))
                      .alias("c"))
            .groupBy(F.col("c.i").alias("i"), F.col("c.pos").alias("pos"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def cms_query(sketch: DataFrame, probe: DataFrame,
              key_col: str) -> DataFrame:
    """Point-frequency estimates: min over the d counters — a
    broadcast join against the ≤ d·w-row sketch, zero shuffle of the
    probe side beyond the final tiny aggregate."""
    pos = (probe.select(key_col,
                        F.explode(cms_position_rows(F.col(key_col)))
                        .alias("c"))
           .select(key_col, F.col("c.i").alias("i"),
                   F.col("c.pos").alias("pos")))
    joined = pos.join(F.broadcast(sketch), ["i", "pos"], "left")
    return (joined.groupBy(key_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias("cms_est")))
