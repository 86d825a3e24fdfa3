"""json_parser — stanza's JSON body parser.

Reference: receiver/stanzareceiver/register.go:20 and README.md:39-52 —
parse a JSON body into record fields, with the same optional
timestamp/severity sub-parsers as regex_parser.  Also covers the Splunk
HEC receiver shape (receiver/splunkhecreceiver/splunk_to_logdata.go:33-90):
JSON events whose ``fields`` become attributes and whose epoch-seconds
``time`` becomes the ns timestamp.

Spark-first: ``from_json`` with an explicit schema (JVM-side, codegen) —
never schema inference on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_parser(df: DataFrame, schema: str, parse_from: str = "body",
                prefix: str = "") -> DataFrame:
    """Parse a JSON string column into typed columns.

    ``schema`` is a DDL string, e.g. ``"ts string, level string, user struct<id:long>"``.
    Adds one column per top-level field (optionally prefixed) and a
    ``parsed`` flag (false for malformed JSON — kept, not dropped).

    Malformed detection: PERMISSIVE from_json yields an all-NULL struct
    (not a NULL struct) on bad input, so a corrupt-record column is the
    reliable flag.
    """
    parsed = F.from_json(F.col(parse_from), schema + ", _corrupt_record string",
                         {"columnNameOfCorruptRecord": "_corrupt_record"})
    df = df.withColumn("_j", parsed)
    df = df.withColumn(
        "parsed",
        F.col(parse_from).isNotNull() & F.col("_j._corrupt_record").isNull())
    for field in df.select("_j.*").columns:
        if field != "_corrupt_record":
            df = df.withColumn(prefix + field, F.col(f"_j.{field}"))
    return df.drop("_j")


def csv_parser(df: DataFrame, schema: str, parse_from: str = "body",
               prefix: str = "", sep: str = ",") -> DataFrame:
    """stanza-style csv_parser (the stanza ecosystem's csv operator,
    next to the registered json/regex trio — register.go:19-22): parse
    a delimited line into typed named columns.

    Spark-first: ``from_csv`` with an explicit DDL schema — the JVM
    uniVocity parser, so RFC-4180 quoting/escaping come for free and
    the hot path stays codegen-adjacent (no Python).  Adds a
    ``parsed`` flag; malformed lines are kept with NULL fields
    (PERMISSIVE + corrupt-record column, the json_parser discipline).
    """
    parsed = F.from_csv(
        F.col(parse_from), schema + ", _corrupt_record string",
        {"sep": sep, "mode": "PERMISSIVE",
         # RFC-4180 quote doubling ("" inside a quoted field), not the
         # uniVocity backslash default
         "escape": '"',
         "columnNameOfCorruptRecord": "_corrupt_record"})
    df = df.withColumn("_c", parsed)
    df = df.withColumn(
        "parsed",
        F.col(parse_from).isNotNull() & F.col("_c._corrupt_record").isNull())
    for field in df.select("_c.*").columns:
        if field != "_corrupt_record":
            df = df.withColumn(prefix + field, F.col(f"_c.{field}"))
    return df.drop("_c")


def splunk_hec_events(df: DataFrame, json_col: str = "body") -> DataFrame:
    """Splunk HEC event JSON -> flat log rows (splunk_to_logdata.go:33-90):
    ``time`` (epoch seconds, possibly fractional) -> ``ts_ns`` int64 nanos
    (splunk_to_logdata.go:54-56); ``host``/``source``/``sourcetype`` ->
    resource attributes; ``event`` -> body; ``fields`` -> attributes map.
    """
    schema = ("time double, host string, source string, sourcetype string, "
              "index string, event string, fields map<string,string>")
    out = df.withColumn("_e", F.from_json(F.col(json_col), schema))
    return (out
            .withColumn("ts_ns", (F.col("_e.time") * F.lit(1e9)).try_cast("long"))
            .withColumn("host", F.col("_e.host"))
            .withColumn("hec_source", F.col("_e.source"))
            .withColumn("sourcetype", F.col("_e.sourcetype"))
            .withColumn("event_body", F.col("_e.event"))
            .withColumn("fields", F.col("_e.fields"))
            .drop("_e"))
