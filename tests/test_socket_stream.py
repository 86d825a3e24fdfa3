"""Live-socket ingestion: Spark's socket source driving the parse
stage — the TCP listener analog of the carbon/statsd receivers
(receiver/carbonreceiver: plaintext TCP).  A local TCP server thread
plays the emitting agent; the stream is driven to completion with
processAllAvailable, then counts are compared to the batch parse of
the same lines.

Spark's socket source is a dev-grade source (no offsets/replay) —
documented as such; the production transport remains files/Iceberg,
but this pins that the operator lineage runs unchanged off a live
socket.
"""

import socket
import threading
import time

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.carbon import (
    parse_plaintext)

from conftest import rows

LINES = [f"cpu.user {i % 7}.5 160{i % 10}000000" for i in range(200)] + \
        ["mem.free 1024 1600000000", "bad line without parts"]


def _serve(port_holder, stop_evt):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port_holder.append(srv.getsockname()[1])
    srv.settimeout(60)
    try:
        conn, _ = srv.accept()
        conn.sendall(("\n".join(LINES) + "\n").encode())
        # keep the connection open until the reader is done, else the
        # socket source errors the stream on EOF mid-batch
        stop_evt.wait(timeout=90)
        conn.close()
    finally:
        srv.close()


def test_socket_stream_matches_batch_parse(spark, tmp_path):
    port_holder, stop_evt = [], threading.Event()
    t = threading.Thread(target=_serve, args=(port_holder, stop_evt),
                         daemon=True)
    t.start()
    for _ in range(100):
        if port_holder:
            break
        time.sleep(0.05)
    lines = (spark.readStream.format("socket")
             .option("host", "127.0.0.1")
             .option("port", port_holder[0]).load())
    parsed = parse_plaintext(lines.withColumnRenamed("value", "line"))
    q = (parsed.groupBy("metric_path").count()
         .writeStream.format("memory").queryName("t_socket")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            q.processAllAvailable()
            n = spark.sql(
                "SELECT coalesce(sum(count),0) AS n FROM t_socket"
            ).collect()[0].n
            if n >= len(LINES):   # every line yields a metric_path
                break
            time.sleep(0.3)
    finally:
        stop_evt.set()
        q.stop()
    got = rows(spark.sql("SELECT metric_path, count FROM t_socket"))
    df = spark.createDataFrame([(l,) for l in LINES], "line string")
    want = rows(parse_plaintext(df).groupBy("metric_path").count())
    assert got == want
