"""Production HTTP listener — the push-ingest edge for the wire/HEC paths.

Reference semantics: the collector's HTTP receivers accept POSTed
bodies and push the decoded pdata into the pipeline —
receiver/signalfxreceiver/receiver.go:59 (``application/x-protobuf``
body), :186 (content-type gate -> 415-style error counter, invalid
method -> error), receiver/splunkhecreceiver/receiver.go:96-160
(POST-only gate, gzip Content-Encoding inflate, per-request JSON ack
``{"text":"Success","code":0}``).

Spark-first architecture: a collector instance holds request bodies in
memory and loses them on crash unless a queue is configured.  A Spark
cluster instead needs a durable, replayable edge, so the listener's
ONLY job is to gate + spool: every accepted body becomes ONE file in a
spool directory via write-to-temp + atomic rename, and Structured
Streaming's file source tails the directory.  That buys, for free:

- at-least-once with offsets: the file-source checkpoint IS the
  consumed-offset log (the stanza ``offsets`` analog, plans/manifest.py);
- back-pressure: ``maxFilesPerTrigger`` bounds micro-batch size instead
  of an in-memory queue;
- identical lineage to batch: the spool stream feeds the SAME
  ``decode_requests`` / ``splunk_hec_events`` operators, so bytes ->
  pdata -> entries is one code path whether replayed or live.

The listener is an edge DAEMON, not a Spark job: in production one (or
an LB'd fleet) runs next to the object store writing the spool; here it
runs in-process for tests.  Bodies are spooled RAW (gzip or identity)
— the wire decoder auto-detects gzip per body, so the edge never pays
an inflate, and a replay is byte-identical to what was received.
"""

from __future__ import annotations

import itertools
import json
import os
import threading
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# route table: path -> (spool subdir, allowed content-types).
# signalfxreceiver gates exact content-type (receiver.go:186); HEC
# accepts json + explicit charset variants.
WIRE_PATH = "/v1/tokens"
HEC_PATH = "/services/collector"
OTLP_LOGS_PATH = "/v1/logs"          # the otlphttp JSON endpoint shape
ROUTES = {
    WIRE_PATH: ("wire", ("application/x-protobuf",)),
    HEC_PATH: ("hec", ("application/json", "application/json; charset=utf-8")),
    OTLP_LOGS_PATH: ("otlp",
                     ("application/json", "application/json; charset=utf-8")),
}
HEC_ACK = json.dumps({"text": "Success", "code": 0}).encode()


class _Handler(BaseHTTPRequestHandler):
    # ThreadingHTTPServer + HTTP/1.1 keep-alive
    protocol_version = "HTTP/1.1"

    def log_message(self, *a):        # quiet: tests assert via counters
        pass

    def _reply(self, code: int, body: bytes = b"") -> None:
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body:
            self.wfile.write(body)

    def do_GET(self):                 # POST-only (receiver.go:96)
        self.server.listener._bump("rejected")
        self._reply(405)

    def do_POST(self):
        srv = self.server.listener
        route = ROUTES.get(self.path)
        if route is None:
            srv._bump("rejected")
            return self._reply(404)
        subdir, ctypes = route
        ctype = (self.headers.get("Content-Type") or "").lower()
        if ctype not in ctypes:       # receiver.go:186 content-type gate
            srv._bump("rejected")
            return self._reply(415)
        try:
            length = int(self.headers.get("Content-Length", ""))
        except ValueError:
            srv._bump("rejected")
            return self._reply(411)
        body = self.rfile.read(length)
        if len(body) != length or length == 0:
            srv._bump("rejected")
            return self._reply(400)
        srv._spool(subdir, body)
        srv._bump("accepted")
        self._reply(200, HEC_ACK if subdir == "hec" else b"{}")


class HttpSpoolListener:
    """POST gate + atomic spool writer.  ``start()`` binds an ephemeral
    port and serves on a daemon thread; ``stop()`` shuts down cleanly.
    ``accepted``/``rejected`` mirror the receiver's self-metrics."""

    def __init__(self, spool_dir: str, host: str = "127.0.0.1",
                 port: int = 0):
        self.spool_dir = spool_dir
        self._host, self._port = host, port
        self._seq = itertools.count()
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.accepted = 0
        self.rejected = 0
        # handler threads (ThreadingHTTPServer) bump concurrently —
        # unsynchronized += loses counts under parallel POSTs
        self._count_lock = threading.Lock()
        for sub, _ in ROUTES.values():
            os.makedirs(os.path.join(spool_dir, sub), exist_ok=True)

    def _bump(self, counter: str) -> None:
        with self._count_lock:
            setattr(self, counter, getattr(self, counter) + 1)

    # -- spool ---------------------------------------------------------
    def _spool(self, subdir: str, body: bytes) -> str:
        """temp + os.replace: the file source must never list a
        half-written body (same discipline as sinks/maintenance.py)."""
        d = os.path.join(self.spool_dir, subdir)
        name = f"req-{next(self._seq):08d}-{uuid.uuid4().hex[:8]}.bin"
        tmp = os.path.join(d, f".tmp-{name}")
        with open(tmp, "wb") as f:
            f.write(body)
        final = os.path.join(d, name)
        os.replace(tmp, final)
        return final

    # -- lifecycle -----------------------------------------------------
    def start(self) -> int:
        self._server = ThreadingHTTPServer((self._host, self._port),
                                           _Handler)
        self._server.listener = self
        self._port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()
        return self._port

    @property
    def url(self) -> str:
        return f"http://{self._host}:{self._port}"

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


# ---------------------------------------------------------------------------
# Spark surface: stream the spool through the existing decode lineage
# ---------------------------------------------------------------------------

def _spool_bodies(spark: SparkSession, spool_dir: str, subdir: str,
                  max_files: int | None = None) -> DataFrame:
    """Unbounded (path, request:binary) over a spool subdir.  binaryFile
    keeps one request body per row — exactly the unit the batch decoders
    take — and ``pathGlobFilter`` skips in-flight temp files (the atomic
    rename makes this belt-and-braces, not load-bearing)."""
    r = (spark.readStream.format("binaryFile")
         .schema("path string, modificationTime timestamp, "
                 "length long, content binary")
         .option("pathGlobFilter", "req-*.bin"))
    if max_files is not None:
        r = r.option("maxFilesPerTrigger", str(max_files))
    df = r.load(os.path.join(spool_dir, subdir))
    return df.select(F.col("path"), F.col("content").alias("request"))


def spooled_wire_stream(spark: SparkSession, spool_dir: str,
                        max_files: int | None = None) -> DataFrame:
    """Spooled wire request bodies -> canonical tokens rows (unbounded).
    decode_requests' mapInPandas runs unchanged per micro-batch; gzip
    vs identity is auto-detected per body."""
    from .wire import decode_requests
    return decode_requests(
        _spool_bodies(spark, spool_dir, "wire", max_files))


def spooled_otlp_logs_stream(spark: SparkSession, spool_dir: str,
                             max_files: int | None = None) -> DataFrame:
    """Spooled OTLP/JSON log bodies (one ExportLogsServiceRequest per
    request, possibly gzip Content-Encoding) -> flat log rows via the
    pure-codegen parse_otlp_logs — the otlphttp receiver analog."""
    import gzip as _gzip
    import pandas as pd
    from .wire import _GZIP_MAGIC
    from ..operators.otlp import parse_otlp_logs

    def inflate(it):
        for pdf in it:
            texts = []
            for blob in pdf["request"]:
                raw = bytes(blob)
                if raw[:2] == _GZIP_MAGIC:
                    raw = _gzip.decompress(raw)
                texts.append(raw.decode("utf-8"))
            yield pd.DataFrame({"request": texts})

    bodies = _spool_bodies(spark, spool_dir, "otlp", max_files)
    return parse_otlp_logs(
        bodies.mapInPandas(inflate, schema="request string"))


def spooled_hec_stream(spark: SparkSession, spool_dir: str,
                       max_files: int | None = None) -> DataFrame:
    """Spooled HEC bodies -> flat HEC log rows (unbounded).  A body is
    newline-delimited event JSON (the HEC batch contract); bodies may be
    gzip (Content-Encoding) — inflated here, splunkhecreceiver
    receiver.go:118-127."""
    from .wire import _GZIP_MAGIC  # shared magic constant
    import gzip as _gzip
    import pandas as pd

    def inflate(it):
        for pdf in it:
            texts = []
            for blob in pdf["request"]:
                raw = bytes(blob)
                if raw[:2] == _GZIP_MAGIC:
                    raw = _gzip.decompress(raw)
                texts.append(raw.decode("utf-8"))
            yield pd.DataFrame({"text": texts})

    from ..operators.json_parser import splunk_hec_events
    bodies = _spool_bodies(spark, spool_dir, "hec", max_files)
    lines = (bodies.mapInPandas(inflate, schema="text string")
             .select(F.explode(F.split(F.col("text"), "\n")).alias("body"))
             .filter(F.length("body") > 0))
    return splunk_hec_events(lines)
