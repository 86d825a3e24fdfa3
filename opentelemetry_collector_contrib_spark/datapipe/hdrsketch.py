"""HdrHistogram-style mergeable quantile sketch — bounded-relative-
error percentiles with O(buckets) state per group.

Completes the sketch family next to HLL (distinct counts,
``sketches.py::hll_*``) and count-min (frequencies): exact percentiles
(``queries_ext.q_latency_quantiles``) need the full value multiset per
group — at 10^12 events that is the one aggregate that cannot run as a
partial-agg groupBy.  The telemetry answer (HdrHistogram, public
domain; the same base-2-octave + linear-sub-bucket layout OpenTelemetry
exponential histograms use) buckets values logarithmically so per-group
state collapses to O(octaves x 2^sub_bits) counters that partial-agg
combine and merge by plain counter addition.

Why this variant and not DDSketch's ln(x)/ln(gamma) indexing: the
bucket index here is PURE INTEGER arithmetic — msb via
``length(bin(v)) - 1``, power-of-two shifts via exact double division —
so Spark and DuckDB compute bit-identical buckets and the sketch is
oracle-checkable.  A natural-log index is within 1 ulp across libm
implementations, which is exactly the kind of boundary divergence a
value-hash gate cannot tolerate.

Layout (sub_bits = s): values 1..2^(s+1)-1 get unit buckets (exact);
above that, each octave m = floor(log2 v) > s holds 2^s buckets of
width 2^(m-s).  bucket id = (shift << (s+1)) + (v >> shift) with
shift = max(m-s, 0) — strictly monotone in v, so quantile extraction
is a cumulative count over bucket order.  Relative error <= 2^-s.

Guarantee (pinned in tests): the reported quantile is the UPPER edge
of the bucket holding the nearest-rank value, so
``estimate >= exact`` and ``estimate <= exact * (1 + 2^-s)``.

Value domain: scaled values must stay below 2^53 (the double-exact
integer range — 9e15, far above any real telemetry metric at any
scale factor).  ``hdr_bucket``'s index math is exact to 2^62, but the
UPPER-EDGE arithmetic (``hdr_bucket_hi``) multiplies in double, so
edges beyond 2^53 would drift ulps from the integer twin and the top
octave's edge (2^63) overflows BIGINT differently per engine.  Scale
metrics into the domain (or raise the scale divisor), don't feed raw
nanosecond-epoch timestamps as values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUB_BITS = 5            # relative error <= 1/32 ~ 3.1%


def hdr_bucket(v, sub_bits: int = SUB_BITS):
    """Bucket id for a positive BIGINT column — integer-exact in both
    engines.  Non-positive values map to bucket 0 (the underflow
    counter)."""
    m = F.length(F.bin(v)) - 1                      # floor(log2 v)
    shift = F.greatest(m - sub_bits, F.lit(0))
    # literal integer shift — exact for ALL int64, unlike the earlier
    # floor(v / pow(2.0, shift)) which leaned on pow(2, n) being exact
    # in float64 (true, but libm pow is outside this repo's cross-engine
    # exactness rules and the double quotient capped the domain at 2^53)
    scaled = F.call_function("shiftright", v.cast("long"),
                             shift.cast("int"))
    return (F.when(v <= 0, F.lit(0))
            .otherwise((shift.cast("long") * (1 << (sub_bits + 1)))
                       + scaled))


def hdr_bucket_hi(bucket, sub_bits: int = SUB_BITS):
    """Inclusive upper value edge of a bucket id (the reported
    quantile representative)."""
    shift = (bucket / (1 << (sub_bits + 1))).cast("long")
    base = bucket - shift * (1 << (sub_bits + 1))
    # hi = (base + 1) * 2^shift - 1, in integer shifts
    return (F.call_function("shiftleft", (base + 1).cast("long"),
                            shift.cast("int")) - 1).cast("long")


def hdr_build(df: DataFrame, value_col, group_cols: list[str],
              sub_bits: int = SUB_BITS) -> DataFrame:
    """The sketch: (group_cols..., bucket, cnt).  ONE partial-agg
    exchange carrying O(groups x buckets) rows — never the values.
    ``value_col`` must already be an integer column (scale decimals up
    front, e.g. ``F.round(value * 100)``)."""
    b = hdr_bucket(F.col(value_col).cast("long"), sub_bits)
    return (df.groupBy(*group_cols, b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge law: counter addition.  merge(build(A), build(B)) ==
    build(A ∪ B) exactly (law-tested)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("cnt",)]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(sketch: DataFrame, qs: list[float],
                  group_cols: list[str],
                  sub_bits: int = SUB_BITS) -> DataFrame:
    """Quantile extraction: per group, the upper edge of the first
    bucket whose cumulative count reaches ceil(q*n) (nearest-rank).
    O(buckets) window rows per group; output one row per group with a
    column per requested quantile."""
    w = Window.partitionBy(*group_cols).orderBy("bucket")
    n = F.sum("cnt").over(Window.partitionBy(*group_cols))
    cum = F.sum("cnt").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    hi = hdr_bucket_hi(F.col("bucket"), sub_bits)
    ranked = (sketch.withColumn("n", n).withColumn("cum", cum)
              .withColumn("hi", hi))
    aggs = [F.count(F.lit(1)).alias("n_buckets"), F.max("n").alias("n")]
    for q in qs:
        tag = f"p{round(q * 100)}"
        target = F.ceil(F.lit(q) * F.col("n"))
        aggs.append(
            F.min(F.when(F.col("cum") >= target, F.col("hi")))
            .alias(tag))
    return ranked.groupBy(*group_cols).agg(*aggs)


def hdr_bucket_py(v: int, sub_bits: int = SUB_BITS) -> int:
    """Python twin (tests)."""
    if v <= 0:
        return 0
    m = v.bit_length() - 1
    shift = max(m - sub_bits, 0)
    return (shift << (sub_bits + 1)) + (v >> shift)


def hdr_bucket_hi_py(bucket: int, sub_bits: int = SUB_BITS) -> int:
    shift = bucket >> (sub_bits + 1)
    base = bucket - (shift << (sub_bits + 1))
    return ((base + 1) << shift) - 1
