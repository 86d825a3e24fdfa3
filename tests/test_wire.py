"""Literal wire codec: protobuf-style frames + gzip (sources/wire.py).

Round-trip (including every varint width boundary), reference-parity
against Python's own scalar varint logic, corruption/truncation
detection, and the Spark surface (pandas-UDF encode, mapInPandas
receive path) — the byte layer the reference moves over HTTP
(signalfxreceiver/receiver.go:59, sumologicexporter/compress.go:38-48).
"""

import gzip

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.wire import (
    decode_frames, decode_tokens_wire_udf, decode_wire, encode_frames,
    encode_wire_udf, pack_varints_flat, unpack_varints_flat,
    varint_payload_bytes_udf, varint_sizes)

from conftest import rows

BOUNDARY_VALS = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152,
                 268435455, 268435456, 2**31 - 1]


def _scalar_varint(n: int) -> bytes:
    """Independent per-value twin (the textbook scalar loop)."""
    out = bytearray()
    while True:
        if n < 0x80:
            out.append(n)
            return bytes(out)
        out.append((n & 0x7F) | 0x80)
        n >>= 7


def test_pack_matches_scalar_twin():
    vals = np.array(BOUNDARY_VALS, dtype=np.int64)
    buf, w = pack_varints_flat(vals)
    expect = b"".join(_scalar_varint(int(v)) for v in vals)
    assert buf.tobytes() == expect
    assert w.tolist() == [len(_scalar_varint(int(v))) for v in vals]


def test_unpack_round_trip_boundaries():
    vals = np.array(BOUNDARY_VALS, dtype=np.int64)
    buf, _ = pack_varints_flat(vals)
    got, counts = unpack_varints_flat(buf, np.array([len(buf)]))
    assert np.array_equal(got, vals)
    assert counts.tolist() == [len(vals)]


def test_frame_round_trip_mixed_rows():
    rng = np.random.default_rng(7)
    toks = [rng.integers(0, 2**31, size=int(k)).astype(np.int64)
            for k in rng.integers(0, 40, size=100)]
    toks += [np.array([], dtype=np.int64)]
    ids = [f"doc-{i}" for i in range(len(toks))]
    srcs = [f"s{i % 3}" for i in range(len(toks))]
    for codec in ("gzip", "none"):
        d, t, s = decode_frames(
            encode_frames(ids, toks, srcs, codec=codec), codec="auto")
        assert d == ids and s == srcs
        for a, b in zip(toks, t):
            assert np.array_equal(a, b.astype(np.int64))
            assert b.dtype == np.int32


def test_gzip_frames_deterministic_and_sniffed():
    f1 = encode_frames(["a"], [np.array([5])], ["x"], codec="gzip")
    f2 = encode_frames(["a"], [np.array([5])], ["x"], codec="gzip")
    assert f1 == f2                       # mtime pinned to 0
    plain = encode_frames(["a"], [np.array([5])], ["x"], codec="none")
    mixed = [f1[0], plain[0]]             # receiver accepts both bodies
    d, t, s = decode_frames(mixed, codec="auto")
    assert d == ["a", "a"] and [x.tolist() for x in t] == [[5], [5]]


def test_unicode_ids_survive():
    d, t, s = decode_frames(
        encode_frames(["döc-β"], [np.array([1, 2])], ["srç"]))
    assert d == ["döc-β"] and s == ["srç"]


def test_corruption_detected():
    msg = gzip.decompress(
        encode_frames(["a"], [np.array([300])], ["x"])[0])
    with pytest.raises(ValueError, match="bad tag"):
        decode_frames([bytes([0x22]) + msg[1:]], codec="none")
    with pytest.raises(ValueError):
        decode_frames([msg[:-1]], codec="none")      # truncated field
    with pytest.raises(ValueError, match="crosses a frame"):
        # payload ends on a continuation byte
        unpack_varints_flat(np.array([0x80], dtype=np.uint8),
                            np.array([1]))
    with pytest.raises(ValueError, match="int32"):
        varint_sizes(np.array([2**31]))
    with pytest.raises(ValueError):
        varint_sizes(np.array([-1]))


@settings(max_examples=60, deadline=None)
@given(st.binary(max_size=200))
def test_fuzz_decode_never_hangs_or_misparses(blob):
    """Arbitrary bytes must either raise ValueError (or a gzip/utf8
    error) or decode losslessly — never crash with an internal error
    or return silently-wrong shapes."""
    from opentelemetry_collector_contrib_spark.sources.wire import (
        decode_request)
    import zlib
    try:
        d, t, s = decode_frames([blob], codec="none")
        assert len(d) == len(t) == len(s) == 1
    except (ValueError, UnicodeDecodeError, IndexError):
        pass
    try:
        decode_request(blob, codec="none")
    except (ValueError, UnicodeDecodeError, IndexError):
        pass
    try:
        decode_frames([blob], codec="auto")
    except (ValueError, UnicodeDecodeError, IndexError, zlib.error,
            EOFError, OSError):
        pass


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.integers(0, 2**31 - 1), max_size=30),
                max_size=20))
def test_property_round_trip(tok_rows):
    toks = [np.array(rw, dtype=np.int64) for rw in tok_rows]
    ids = [f"d{i}" for i in range(len(toks))]
    srcs = ["s"] * len(toks)
    d, t, s = decode_frames(encode_frames(ids, toks, srcs))
    assert d == ids
    for a, b in zip(toks, t):
        assert np.array_equal(a, b.astype(np.int64))


def test_spark_wire_round_trip(spark):
    df = spark.createDataFrame(
        [("d1", [1, 128, 2097152], "a"), ("d2", [], "b"),
         ("d3", [2**31 - 1, 0], "a")],
        "doc_id string, tokens array<int>, source string")
    enc = encode_wire_udf("gzip")
    dec = decode_tokens_wire_udf()
    out = (df.withColumn("wire", enc("doc_id", "tokens", "source"))
             .withColumn("dec", dec("wire"))
             .withColumn("same", F.col("dec").eqNullSafe(F.col("tokens"))))
    got = rows(out, "doc_id", "same")
    assert got == [("d1", True), ("d2", True), ("d3", True)]


def test_spark_receive_path_schema_and_values(spark):
    df = spark.createDataFrame(
        [("d1", [10, 20], "a"), ("d2", [300], "b")],
        "doc_id string, tokens array<int>, source string")
    enc = encode_wire_udf("gzip")
    frames = df.select(enc("doc_id", "tokens", "source").alias("wire"))
    back = decode_wire(frames)
    assert [f.name for f in back.schema.fields] == [
        "doc_id", "tokens", "n_tok", "source"]
    assert rows(back, "doc_id", "tokens", "n_tok", "source") == [
        ("d1", [10, 20], 2, "a"), ("d2", [300], 1, "b")]


def test_payload_bytes_udf_matches_scalar(spark):
    df = spark.createDataFrame(
        [("d1", BOUNDARY_VALS), ("d2", []), ("d3", [127, 128])],
        "doc_id string, tokens array<int>")
    out = rows(df.withColumn("pb", varint_payload_bytes_udf()("tokens")),
               "doc_id", "pb")
    expect = {
        "d1": sum(len(_scalar_varint(v)) for v in BOUNDARY_VALS),
        "d2": 0, "d3": 3}
    assert out == sorted((k, v) for k, v in expect.items())


def test_streaming_wire_ingest_matches_batch(spark, sf_dir, tmp_path):
    """A stream of raw wire frames decodes + parses to exactly the
    batch pipeline's output — bytes-in streaming receiver parity."""
    from opentelemetry_collector_contrib_spark.operators.regex_parser import (
        RegexParser)
    from opentelemetry_collector_contrib_spark.sources.tokens_source import (
        read_tokens)
    from opentelemetry_collector_contrib_spark.streaming.stream_pipeline import (
        streaming_wire_ingest)
    enc = encode_wire_udf("gzip")
    toks = read_tokens(spark, f"{sf_dir}/tokens.parquet")
    frames_dir = str(tmp_path / "frames")
    (toks.select(enc("doc_id", "tokens", "source").alias("wire"))
         .write.parquet(frames_dir))
    parsed = streaming_wire_ingest(spark, frames_dir)
    q = (parsed.groupBy("source", "severity_text")
         .count()
         .writeStream.format("memory").queryName("t_wire_stream")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.sql("SELECT source, severity_text, count AS n "
                    "FROM t_wire_stream")
    batch = (RegexParser().apply(toks)
             .groupBy("source", "severity_text")
             .agg(F.count(F.lit(1)).alias("n")))
    assert rows(got) == rows(batch)


def test_batched_request_round_trip():
    from opentelemetry_collector_contrib_spark.sources.wire import (
        decode_request, encode_request)
    rng = np.random.default_rng(5)
    toks = [rng.integers(0, 2**31, size=int(k)).astype(np.int64)
            for k in rng.integers(0, 30, size=50)]
    ids = [f"d{i}" for i in range(50)]
    srcs = [f"s{i % 3}" for i in range(50)]
    for codec in ("gzip", "none"):
        blob = encode_request(ids, toks, srcs, codec=codec)
        d, t, s = decode_request(blob)
        assert d == ids and s == srcs
        for a, b in zip(toks, t):
            assert np.array_equal(a, b.astype(np.int64))
    with pytest.raises(ValueError, match="bad batch element tag"):
        decode_request(b"\x22" + encode_request(ids, toks, srcs,
                                                codec="none")[1:],
                       codec="none")


def test_local_batched_requests_round_trip_and_sizing(spark):
    from opentelemetry_collector_contrib_spark.sources.wire import (
        decode_requests, encode_requests_local)
    df = spark.createDataFrame(
        [(f"d{i}", [i % 7], f"s{i % 2}") for i in range(250)],
        "doc_id string, tokens array<int>, source string").coalesce(1)
    reqs = encode_requests_local(df, max_records=100)
    assert reqs.count() == 3          # 100+100+50 in one partition
    back = decode_requests(reqs)
    assert rows(back, "doc_id", "tokens", "source") == \
        rows(df, "doc_id", "tokens", "source")
    plan = reqs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan     # the whole point vs keyed batching


def test_spark_batched_requests_match_rows(spark):
    from opentelemetry_collector_contrib_spark.sources.wire import (
        decode_requests, encode_requests)
    df = spark.createDataFrame(
        [(f"d{i}", list(range(i % 5)), f"s{i % 2}", f"b{i % 3}")
         for i in range(40)],
        "doc_id string, tokens array<int>, source string, batch_id string")
    reqs = encode_requests(df, "batch_id")
    assert reqs.count() == 3
    back = decode_requests(reqs)
    assert rows(back, "doc_id", "tokens", "n_tok", "source") == \
        rows(df.withColumn("n_tok", F.size("tokens")),
             "doc_id", "tokens", "n_tok", "source")


def test_receive_plan_is_one_python_hop(spark):
    """The decode hot path must be a single ArrowEvalPython /
    mapInPandas stage over the frames scan — no extra exchanges."""
    df = spark.createDataFrame(
        [("d1", [1, 2], "a")],
        "doc_id string, tokens array<int>, source string")
    enc = encode_wire_udf("none")
    frames = df.select(enc("doc_id", "tokens", "source").alias("wire"))
    plan = decode_wire(frames)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1
    assert "Exchange" not in plan


def test_deflate_codec_round_trip():
    """compress.go:44-52: the exporter's third encoding is raw DEFLATE
    (flate.NewWriter — no gzip/zlib header).  Explicit-codec round trip
    at both the frame and request level; 'auto' must NOT claim it."""
    import pytest
    from opentelemetry_collector_contrib_spark.sources.wire import (
        decode_frames, decode_request, encode_frames, encode_request)
    ids = ["a", "b"]
    toks = [[1, 2, 3], [400000, 5]]
    srcs = ["s1", "s2"]
    frames = encode_frames(ids, toks, srcs, codec="deflate")
    # raw deflate: no gzip magic
    assert frames[0][:2] != b"\x1f\x8b"
    d, t, s = decode_frames(frames, codec="deflate")
    assert list(d) == ids and [list(x) for x in t] == toks
    req = encode_request(ids, toks, srcs, codec="deflate")
    d2, t2, s2 = decode_request(req, codec="deflate")
    assert list(d2) == ids and [list(x) for x in t2] == toks
    assert list(s2) == srcs
    # header-less deflate cannot be sniffed — auto sees garbage tags
    with pytest.raises(Exception):
        decode_request(req, codec="auto")
