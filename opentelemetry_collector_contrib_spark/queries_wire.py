"""Driver-contract queries for the literal wire codec (sources/wire.py).

Strategy: the oracle can't parse protobuf, so each query routes the
DATA through encode -> bytes -> decode on the Spark side and computes
the same aggregates directly from the source columns on the DuckDB
side — any codec bug (wrong continuation bit, frame misalignment,
gzip corruption) breaks the value hash.  Token values are widened
in-query with ``shiftleft(t, t % 12)`` (identically in SQL) so the
packed varints span 1..4 byte widths instead of the ASCII-only 1-byte
case.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.tokens_source import read_tokens
from .sources.wire import (VARINT_LEN_SQL, decode_tokens_wire_udf,
                           decode_wire, encode_wire_udf,
                           varint_payload_bytes_udf)

#: widen ASCII token ids to 1..4-byte varint range (same text in both
#: engines; DuckDB twin below).
BIG_EXPR = "transform(tokens, t -> shiftleft(t, t % 12))"
BIG_SQL = "list_transform(tokens, t -> t * (1 << (t % 12)))"


def _tok(spark: SparkSession, tok_dir: str) -> DataFrame:
    return read_tokens(spark, os.path.join(tok_dir, "tokens.parquet"))


def q_wire_roundtrip(spark: SparkSession, sf_dir: str,
                     tok_dir: str) -> DataFrame:
    """encode(gzip) -> decode in-row -> per-source aggregates plus a
    row-aligned token-array equality count (must be 0 mismatches) —
    the BASELINE.json per-row invariant checked through real bytes."""
    enc = encode_wire_udf("gzip")
    dec = decode_tokens_wire_udf("auto")
    d = (_tok(spark, tok_dir)
         .withColumn("big", F.expr(BIG_EXPR))
         .withColumn("wire", enc("doc_id", "big", "source"))
         .withColumn("dec", dec("wire")))
    return (d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("dec")).alias("sum_n_tok"),
        F.sum(F.expr("aggregate(dec, 0L, (a, t) -> a + t)"))
         .alias("sum_tok"),
        F.sum(F.when(F.col("dec") != F.col("big"), 1).otherwise(0))
         .cast("long").alias("n_mismatch")))


def q_wire_receive(spark: SparkSession, sf_dir: str,
                   tok_dir: str) -> DataFrame:
    """Full receiver analog: a frames-only table (nothing but bytes)
    is decoded back to the canonical schema via ONE mapInPandas hop,
    then aggregated — doc_id and source must survive the byte trip."""
    enc = encode_wire_udf("gzip")
    frames = _tok(spark, tok_dir).select(
        enc("doc_id", "tokens", "source").alias("wire"))
    return (decode_wire(frames).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_n_tok"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc")))


def q_wire_sizes(spark: SparkSession, sf_dir: str,
                 tok_dir: str) -> DataFrame:
    """Wire size audit (uncompressed): actual frame bytes measured off
    the real encoded column must equal the oracle's arithmetic
    prediction from the proto layout — catches any over/under-emit."""
    enc = encode_wire_udf("none")
    pay = varint_payload_bytes_udf()
    d = (_tok(spark, tok_dir)
         .withColumn("big", F.expr(BIG_EXPR))
         .withColumn("wire", enc("doc_id", "big", "source"))
         .withColumn("pay_bytes", pay("big")))
    return (d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("pay_bytes").alias("pay_bytes"),
        F.sum(F.length("wire")).alias("msg_bytes")))


def q_wire_batch(spark: SparkSession, sf_dir: str,
                 tok_dir: str) -> DataFrame:
    """The exporter's real request shape: rows buffered IN ARRIVAL
    ORDER into ~max_records bodies, ONE serialize+gzip per request
    (sender.go:56,233-239) — partition-local, zero shuffle.  The
    decoded aggregate is order-independent, so the oracle is exact
    regardless of how rows landed in bodies."""
    from .sources.wire import decode_requests, encode_requests_local
    reqs = encode_requests_local(_tok(spark, tok_dir))
    return (decode_requests(reqs).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("sum_n_tok"),
        F.sum(F.expr("aggregate(tokens, 0L, (a, t) -> a + t)"))
         .alias("sum_tok")))


def wire_queries() -> dict:
    return {
        "wire_roundtrip": q_wire_roundtrip,
        "wire_receive": q_wire_receive,
        "wire_sizes": q_wire_sizes,
        "wire_batch": q_wire_batch,
    }


def wire_oracles(d: str) -> dict[str, str]:
    vl_d = VARINT_LEN_SQL.format(v="dlen")
    vl_p = VARINT_LEN_SQL.format(v="pay_bytes")
    vl_s = VARINT_LEN_SQL.format(v="slen")
    vl_tok = VARINT_LEN_SQL.format(v="v")
    return {
        "wire_roundtrip": f"""WITH t AS (
  SELECT source, {BIG_SQL} AS big
  FROM read_parquet('{d}/tokens.parquet'))
SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(len(big)) AS BIGINT) AS sum_n_tok,
       CAST(sum(list_sum(big)) AS BIGINT) AS sum_tok,
       CAST(0 AS BIGINT) AS n_mismatch
FROM t GROUP BY source""",

        "wire_receive": f"""SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_n_tok,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM read_parquet('{d}/tokens.parquet') GROUP BY source""",

        "wire_batch": f"""SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS sum_n_tok,
       CAST(sum(list_sum(tokens)) AS BIGINT) AS sum_tok
FROM read_parquet('{d}/tokens.parquet') GROUP BY source""",

        "wire_sizes": f"""WITH t AS (
  SELECT source, doc_id, {BIG_SQL} AS big
  FROM read_parquet('{d}/tokens.parquet')),
s AS (
  SELECT source,
         CAST(list_sum(list_transform(big, v -> {vl_tok}))
              AS BIGINT) AS pay_bytes,
         strlen(doc_id) AS dlen, strlen(source) AS slen
  FROM t)
SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(pay_bytes) AS BIGINT) AS pay_bytes,
       CAST(sum(3 + {vl_d} + dlen + {vl_p} + pay_bytes + {vl_s} + slen)
            AS BIGINT) AS msg_bytes
FROM s GROUP BY source""",
    }
