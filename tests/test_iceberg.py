"""Iceberg integration — the north rule's table format.

The sandbox ships WITHOUT the iceberg-spark-runtime jar, so the
round-trip test SKIPS (visibly, never silently) there; with the jar on
the classpath (--packages org.apache.iceberg:iceberg-spark-runtime-*)
the same write_sink/read_tokens calls run against a Hadoop catalog.
The parquet stand-ins (dynamic partition overwrite + _SNAPSHOT.json
publish, sinks/maintenance.py) cover the commit semantics in tests
elsewhere.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling tests)

from opentelemetry_collector_contrib_spark.sources.tokens_source import (
    iceberg_available, iceberg_conf, read_tokens)
from opentelemetry_collector_contrib_spark.sinks.writers import (
    SinkConfig, write_sink)


def test_iceberg_roundtrip_when_jar_present(spark, tmp_path):
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jar not on classpath; "
                    "parquet stand-in path covered by pipeline tests")
    for k, v in iceberg_conf(str(tmp_path / "warehouse")).items():
        spark.conf.set(k, v)
    df = spark.createDataFrame(
        [("d1", "app-a"), ("d2", "k8s")], "doc_id string, source string")
    cfg = SinkConfig(name="ice", path="otel.db.t_roundtrip",
                     table_format="iceberg")
    write_sink(df, cfg, partition_cols=["source"])
    back = read_tokens(spark, "otel.db.t_roundtrip", fmt="iceberg")
    assert back.count() == 2
    assert sorted(r["doc_id"] for r in back.collect()) == ["d1", "d2"]


def test_iceberg_absent_raises_never_degrades(spark):
    """Without the jar, asking for Iceberg must be a loud error — a
    silent parquet fallback would hide a broken production config."""
    if iceberg_available(spark):
        pytest.skip("jar present — covered by the roundtrip test")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        read_tokens(spark, "otel.db.t", fmt="iceberg")
    df = spark.createDataFrame([("d1",)], "doc_id string")
    with pytest.raises(RuntimeError, match="[Ii]ceberg"):
        write_sink(df, SinkConfig(name="x", path="otel.db.t",
                                  table_format="iceberg"))
