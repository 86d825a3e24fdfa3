"""elasticexporter analog — exception span-events → APM error objects.

Reference: ``exporter/elasticexporter/internal/translator/elastic/
exceptions.go`` —

- empty exception message → ``[EMPTY]`` (:43-45); ``Handled`` =
  NOT ``exception.escaped`` (:51);
- stacktrace parsing is language-gated: only ``java`` is implemented;
  any other language (or a parse failure anywhere in the trace) drops
  the parsed structure and keeps the raw string as a ``stacktrace``
  attribute instead (:55-65, :74-80);
- the Java parser (:82-162): first line ignored; leading tabs set the
  indent level (popping back to an outer exception when indentation
  decreases); ``at function(file[:line])`` frames parse module /
  classname / function via the slash and last-dot rules
  (:164-200 — ``class_loader/module/class.method`` collapses to the
  SECOND slash split); ``Caused by: `` starts a cause exception at the
  same indent whose Handled is inherited and whose Message is the rest
  of the line; ``... N more`` appends the LAST N frames of the
  enclosing exception (error if there is no enclosing exception or it
  has fewer than N frames); ``Suppressed: `` blocks are parsed for
  indentation accounting but contribute nothing to the output; any
  other line is a parse error.

Batch shape: the parser is inherently sequential per record, so it
runs as ONE Arrow-batched pandas UDF emitting the flattened cause
chain (array of exception structs) + ``posexplode`` — no per-row
Python round trips, no state across records.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_AT_RX = re.compile(r"at (.*)\(([^:]*)(?::([0-9]+))?\)")
_MORE_RX = re.compile(r"\.\.\. ([0-9]+) more")
_CAUSED_BY = "Caused by: "
_SUPPRESSED = "Suppressed: "


def _parse_frame(line: str):
    """parseJavaStacktraceFrame (exceptions.go:164-200)."""
    m = _AT_RX.search(line)
    if m is None:
        raise ValueError(f"failed to parse stacktrace line {line!r}")
    module, function = "", m.group(1)
    slash = function.find("/")
    if slash >= 0:
        module, function = function[:slash], function[slash + 1:]
        slash = function.find("/")
        if slash >= 0:
            module, function = function[:slash], function[slash + 1:]
    classname = ""
    dot = function.rfind(".")
    if dot > 0:
        classname, function = function[:dot], function[dot + 1:]
    line_no = int(m.group(3)) if m.group(3) else 0
    return (module, classname, function, m.group(2), line_no)


def parse_java_stacktrace(s: str) -> list[dict] | None:
    """setJavaExceptionStacktrace (exceptions.go:82-162) — returns the
    flattened exception chain [{message, frames}] (outer first, then
    causes in order; suppressed blocks ignored) or None on any parse
    error (the caller's raw-attribute fallback)."""
    outer = {"message": None, "frames": []}
    chain = [outer]
    current, enclosing, indent = outer, None, 0
    stack: list[tuple] = []     # (exception, enclosing, indent)
    suppressed_depth = 0
    try:
        lines = s.split("\n")
        if lines and lines[-1] == "":
            lines.pop()         # bufio.Scanner drops the trailing newline
        for raw in lines[1:]:   # first line ignored
            # an interior blank line hits the reference's default case
            line, ind = raw, 0
            i = 0
            while i < len(line) and line[i] == "\t":
                i += 1
            if i > 0:
                line, ind = line[i:], i
            while ind < indent:
                current, enclosing, indent = stack.pop()
                if suppressed_depth > 0:
                    suppressed_depth -= 1
            if line.startswith("at "):
                current["frames"].append(_parse_frame(line))
            elif line.startswith("..."):
                if enclosing is None:
                    raise ValueError(f"no enclosing exception before {line!r}")
                m = _MORE_RX.search(line)
                if m is None:
                    raise ValueError(f"failed to parse {line!r}")
                n = int(m.group(1))
                if len(enclosing["frames"]) < n:
                    raise ValueError(
                        f"enclosing stacktrace has "
                        f"{len(enclosing['frames'])} frames < {n}")
                current["frames"].extend(enclosing["frames"][-n:])
            elif line.startswith(_CAUSED_BY):
                cause = {"message": line[len(_CAUSED_BY):], "frames": []}
                enclosing = current
                current = cause
                if suppressed_depth == 0:
                    chain.append(cause)       # suppressed causes ignored
            elif line.startswith(_SUPPRESSED):
                stack.append((current, enclosing, indent))
                enclosing = current
                current = {"message": None, "frames": []}
                indent = ind
                suppressed_depth += 1
            else:
                raise ValueError(f"unexpected line {line!r}")
    except ValueError:
        return None
    return chain


_EXC_T = T.ArrayType(T.StructType([
    T.StructField("message", T.StringType()),
    T.StructField("frames_s", T.StringType()),
    T.StructField("n_frames", T.IntegerType()),
]))


def _frames_s(frames) -> str:
    return ";".join("|".join([m, c, f, fl, str(ln)])
                    for m, c, f, fl, ln in frames)


@F.pandas_udf(_EXC_T)
def _parse_chain_udf(st: pd.Series, lang: pd.Series) -> pd.Series:
    def one(s, language):
        if s is None or s == "" or language != "java":
            return None
        chain = parse_java_stacktrace(s)
        if chain is None:
            return None
        return [(e["message"], _frames_s(e["frames"]),
                 len(e["frames"])) for e in chain]
    return pd.Series([one(s, lg) for s, lg in zip(st, lang)])


def exception_errors(df: DataFrame) -> DataFrame:
    """encodeExceptionSpanEvent over exception span-event rows.

    Input: ts_ns, trace_id, span_id, exc_type, exc_message,
    exc_stacktrace (nullable), exc_escaped boolean, language.
    Output: one row per exception in the parsed cause chain (depth 0 =
    the outer exception, carrying the type; causes carry their
    ``Caused by:`` message) — or a single depth-0 row with the raw
    stacktrace in ``raw_stacktrace`` when the trace is absent,
    non-java, or unparseable."""
    chain = _parse_chain_udf(F.col("exc_stacktrace"), F.col("language"))
    base = df.select(
        "ts_ns", "trace_id", "span_id", "exc_type",
        F.when(F.coalesce(F.col("exc_message"), F.lit("")) == "",
               F.lit("[EMPTY]")).otherwise(F.col("exc_message"))
        .alias("message0"),
        (~F.col("exc_escaped")).alias("handled"),
        "exc_stacktrace", chain.alias("chain"))
    parsed = (base.filter(F.col("chain").isNotNull())
              .select("ts_ns", "trace_id", "span_id", "exc_type",
                      "message0", "handled",
                      F.posexplode("chain").alias("depth", "e"))
              .select(
                  "ts_ns", "trace_id", "span_id",
                  F.col("depth").cast("int").alias("depth"),
                  F.when(F.col("depth") == 0, F.col("exc_type"))
                  .alias("type"),
                  F.coalesce(F.col("e.message"), F.col("message0"))
                  .alias("message"),
                  "handled", F.col("e.n_frames").alias("n_frames"),
                  F.col("e.frames_s").alias("frames_s"),
                  F.lit(None).cast("string").alias("raw_stacktrace")))
    fallback = (base.filter(F.col("chain").isNull())
                .select(
                    "ts_ns", "trace_id", "span_id",
                    F.lit(0).alias("depth"),
                    F.col("exc_type").alias("type"),
                    F.col("message0").alias("message"),
                    "handled",
                    F.lit(None).cast("int").alias("n_frames"),
                    F.lit(None).cast("string").alias("frames_s"),
                    F.col("exc_stacktrace").alias("raw_stacktrace")))
    return parsed.unionByName(fallback)
