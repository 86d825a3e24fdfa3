"""Production HTTP listener: POST gate + durable spool + Structured
Streaming decode — the push-receiver edge (signalfxreceiver
receiver.go:96-210, splunkhecreceiver receiver.go:96-160).

A real HTTP client (urllib over a live TCP port) plays the emitting
agent; the spool stream is driven to completion with
processAllAvailable and compared against the batch decode of the same
bodies — the bytes -> pdata -> entries lineage is one code path."""

import gzip
import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.sources.http_listener import (
    HEC_PATH, WIRE_PATH, HttpSpoolListener, spooled_hec_stream,
    spooled_wire_stream)
from opentelemetry_collector_contrib_spark.sources.wire import (
    decode_request, encode_request)

from conftest import rows

DOCS = [(f"d{i:03d}", list(range(i % 5 + 1)), f"svc-{i % 3}")
        for i in range(40)]


def _post(url, body, ctype="application/x-protobuf", headers=None):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    for k, v in (headers or {}).items():
        req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=30) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:
        return e.code, e.read()


def test_listener_gates_and_spools(tmp_path):
    # ONE try/finally around the whole body: an assertion failure
    # anywhere must still stop the server thread (a leaked listener
    # holds its port for the rest of the session)
    lst = HttpSpoolListener(str(tmp_path / "spool"))
    lst.start()
    try:
        body = encode_request(*zip(*DOCS), codec="gzip")
        # happy path
        code, _ = _post(lst.url + WIRE_PATH, body)
        assert code == 200
        # content-type gate (receiver.go:186)
        code, _ = _post(lst.url + WIRE_PATH, body, ctype="text/plain")
        assert code == 415
        # POST-only gate (receiver.go:96)
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(lst.url + WIRE_PATH, timeout=30)
        assert exc.value.code == 405
        # unknown path
        code, _ = _post(lst.url + "/nope", b"x")
        assert code == 404
        # empty body
        code, _ = _post(lst.url + WIRE_PATH, b"")
        assert code == 400
        assert lst.accepted == 1 and lst.rejected == 4
        # HEC ack contract (receiver.go:96-160)
        ev = json.dumps({"time": 1.5, "host": "h", "event": "msg"})
        code, ack = _post(lst.url + HEC_PATH, ev.encode(),
                          ctype="application/json")
        assert code == 200
        assert json.loads(ack) == {"text": "Success", "code": 0}
    finally:
        lst.stop()


def test_spooled_wire_stream_matches_batch_decode(spark, tmp_path):
    lst = HttpSpoolListener(str(tmp_path / "spool"))
    lst.start()
    try:
        # three requests: gzip, identity, gzip — decoder auto-detects
        for lo, hi, codec in ((0, 15, "gzip"), (15, 30, "none"),
                              (30, 40, "gzip")):
            body = encode_request(*zip(*DOCS[lo:hi]), codec=codec)
            code, _ = _post(lst.url + WIRE_PATH, body)
            assert code == 200
    finally:
        lst.stop()

    out = spooled_wire_stream(spark, str(tmp_path / "spool"))
    q = (out.writeStream.format("memory").queryName("http_wire")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = rows(spark.table("http_wire")
                   .select("doc_id", F.col("tokens").cast("array<string>")
                           .cast("string").alias("t"), "n_tok", "source"))
    finally:
        q.stop()
    want = sorted((d, str([str(x) for x in t]).replace("'", ""), len(t), s)
                  for d, t, s in DOCS)
    assert [g[0] for g in got] == [w[0] for w in want]
    assert [(g[2], g[3]) for g in got] == [(w[2], w[3]) for w in want]
    # token arrays survive the HTTP+spool round trip exactly
    blob = encode_request(*zip(*DOCS), codec="gzip")
    d, t, s = decode_request(blob)
    assert [list(x) for x in t] == [x[1] for x in DOCS]


def test_spooled_otlp_stream_parses_posted_requests(spark, tmp_path):
    """The otlphttp receiver analog end-to-end: serialize OTLP/JSON on
    the exporter side, POST over live HTTP (plain + gzip bodies),
    stream-parse from the spool, recover the flat rows."""
    from opentelemetry_collector_contrib_spark.sources.http_listener import (
        OTLP_LOGS_PATH, spooled_otlp_logs_stream)
    from opentelemetry_collector_contrib_spark.operators.otlp import (
        serialize_otlp_logs)

    flat = spark.createDataFrame(
        [(f"svc-{i % 2}", 1_700_000_000_000_000_000 + i, 9, "INFO",
          f"body-{i}", {"uid": i}, {"score": i / 8.0},
          "ab" * 16, "cd" * 8) for i in range(8)],
        "service string, ts_unix_nano long, severity_number int, "
        "severity_text string, body string, int_attrs map<string,long>, "
        "dbl_attrs map<string,double>, trace_id string, span_id string")
    reqs = [r["request"] for r in serialize_otlp_logs(flat).collect()]
    assert len(reqs) == 2

    lst = HttpSpoolListener(str(tmp_path / "spool"))
    lst.start()
    try:
        code, ack = _post(lst.url + OTLP_LOGS_PATH, reqs[0].encode(),
                          ctype="application/json")
        assert code == 200 and ack == b"{}"
        code, _ = _post(lst.url + OTLP_LOGS_PATH,
                        gzip.compress(reqs[1].encode()),
                        ctype="application/json",
                        headers={"Content-Encoding": "gzip"})
        assert code == 200
    finally:
        lst.stop()

    out = spooled_otlp_logs_stream(spark, str(tmp_path / "spool"))
    q = (out.writeStream.format("memory").queryName("http_otlp")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = rows(spark.table("http_otlp")
                   .select("body", "ts_unix_nano",
                           F.element_at("attrs", "uid").cast("long")
                           .alias("uid"),
                           F.element_at("resource_attrs", "service.name")
                           .alias("svc")))
    finally:
        q.stop()
    assert len(got) == 8
    assert {g[0] for g in got} == {f"body-{i}" for i in range(8)}
    assert {g[2] for g in got} == set(range(8))
    assert {g[3] for g in got} == {"svc-0", "svc-1"}


def test_spooled_hec_stream_parses_batched_gzip_bodies(spark, tmp_path):
    lst = HttpSpoolListener(str(tmp_path / "spool"))
    lst.start()
    try:
        evs = [json.dumps({"time": 1700000000 + i, "host": f"h{i % 2}",
                           "source": "hec-test", "event": f"e{i}",
                           "fields": {"k": str(i)}})
               for i in range(10)]
        # one plain body with 5 events, one gzip body with 5
        code, _ = _post(lst.url + HEC_PATH, "\n".join(evs[:5]).encode(),
                        ctype="application/json")
        assert code == 200
        code, _ = _post(lst.url + HEC_PATH,
                        gzip.compress("\n".join(evs[5:]).encode()),
                        ctype="application/json",
                        headers={"Content-Encoding": "gzip"})
        assert code == 200
    finally:
        lst.stop()

    out = spooled_hec_stream(spark, str(tmp_path / "spool"))
    q = (out.writeStream.format("memory").queryName("http_hec")
         .outputMode("append").start())
    try:
        q.processAllAvailable()
        got = rows(spark.table("http_hec")
                   .select("event_body", "host", "ts_ns", "fields.k"))
    finally:
        q.stop()
    assert len(got) == 10
    assert {g[0] for g in got} == {f"e{i}" for i in range(10)}
    # epoch-seconds -> ns (splunk_to_logdata.go:54-56)
    assert all(g[2] % 1_000_000_000 == 0 and g[2] >= 1.7e18 for g in got)
    assert {g[3] for g in got} == {str(i) for i in range(10)}
