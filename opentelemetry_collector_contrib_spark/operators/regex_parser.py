"""regex_parser — stanza's named-capture-group regex parser.

Reference semantics (receiver/stanzareceiver/e2e_test.go:93-99,
README.md:24-36, testdata/config.yaml:7-13):
- a Go regex with named capture groups; each group becomes a new record
  field;
- optional ``timestamp: {parse_from, layout}`` sub-parser (strptime
  layout) and ``severity: {parse_from}`` sub-parser feeding the
  convertSeverity table (converter.go:167-217);
- non-matching lines are an error in stanza; we flag them
  (``parsed = false``) and keep the row — goldens assert they are
  flagged, never silently dropped (FIXTURES.md §5.3).

Four execution backends (identical output, tests assert equality):
- 'arrow' (default, the fastest measured — ~9x over 'fused' at sf0.1):
  ``mapInArrow`` keeps the whole parse in NATIVE code: detokenize is a
  buffer-level Arrow StringArray construction (list offsets reused as
  string offsets, zero per-row Python) and the extraction is ONE
  ``pyarrow.compute.extract_regex`` call per batch (RE2, C++).
  Dialect caveat: RE2 — no lookaround/backrefs; patterns RE2 rejects
  fall back to 'fused' automatically (validated at plan build).
  Pushdown caveat: mapInArrow is opaque to Catalyst, so filters
  written AFTER .apply() do not reach the scan — apply source-level
  filters before the parse stage (the pipeline does).
- 'fused': ONE Arrow-batched pandas UDF taking the raw ``tokens``
  column and returning struct(body, <named groups>) — bulk numpy
  detokenize + a single ``pd.Series.str.extract`` (Python re) pass per
  batch.  Full Python-regex dialect; columns flow AROUND the UDF, so
  Catalyst pushdown/pruning still work.
- 'pandas': same extract UDF over an existing ``body`` string column.
- 'native': per-group ``regexp_extract`` — zero Python, but each
  output column re-executes the regex (Catalyst collapses projections
  and re-inlines the extract struct), so it is SLOWER than 'fused' on
  the hot path; kept for cross-checking and for JVM-only deployments.

Both add: one string column per named group, ``parsed`` boolean, and —
when configured — ``event_ts`` (timestamp), ``severity_text``,
``severity_number``.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.severity import severity_number_expr, severity_text_expr
from ..functions.timefmt import strptime_to_spark

# the stanza e2e fixture pattern (e2e_test.go:94), generalized to the
# full `<date time> <SEV> <msg>` line shape of our fixtures
DEFAULT_LOG_PATTERN = (
    r"^(?P<ts>\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}) (?P<sev>[A-Z]+) (?P<msg>.*)$"
)


@lru_cache(maxsize=64)
def _compiled(pattern: str) -> "re.Pattern[str]":
    return re.compile(pattern)


_NAMED_GROUP_RX = re.compile(r"\(\?P<[A-Za-z_][A-Za-z0-9_]*>")


def java_pattern(pattern: str) -> str:
    """Python-regex -> Java-regex: named groups become plain groups.
    (Java group names may not contain underscores, and all extraction in
    this package is by group NUMBER via re.groupindex, so names are only
    metadata on the Python side.)"""
    return _NAMED_GROUP_RX.sub("(", pattern)


def group_number(pattern: str, group_name: str) -> int:
    """1-based group number of a named group in a Python pattern."""
    return _compiled(pattern).groupindex[group_name]


def _re2_ok(pattern: str) -> bool:
    """True when pyarrow's RE2 accepts the pattern (driver-side probe)."""
    try:
        import pyarrow as pa
        import pyarrow.compute as pc
        pc.extract_regex(pa.array([], pa.string()), pattern)
        return True
    except Exception:
        return False


class RegexParser:
    """Config-driven regex parse stage (a DataFrame -> DataFrame builder,
    the Spark analog of a stanza operator plugin)."""

    def __init__(self,
                 pattern: str = DEFAULT_LOG_PATTERN,
                 parse_from: str = "body",
                 tokens_col: str = "tokens",
                 timestamp_from: str | None = "ts",
                 timestamp_layout: str = "%Y-%m-%d %H:%M:%S",
                 severity_from: str | None = "sev",
                 backend: str = "arrow"):
        self.pattern = pattern
        self.parse_from = parse_from
        self.tokens_col = tokens_col
        self.timestamp_from = timestamp_from
        self.timestamp_layout = timestamp_layout
        self.severity_from = severity_from
        self.backend = backend
        self.groups = list(_compiled(pattern).groupindex.keys())
        if not self.groups:
            raise ValueError("regex_parser requires named capture groups")
        if backend == "arrow" and not _re2_ok(pattern):
            # RE2 rejects the pattern (lookaround/backrefs) — fall back
            # to the Python-re fused path, identical semantics
            self.backend = "fused"

    # -- backends ---------------------------------------------------------
    def _extract_arrow(self, df: DataFrame) -> DataFrame:
        """tokens -> body + group columns with ZERO Python on the row
        path: buffer-level detokenize + one RE2 extract_regex per
        batch (mapInArrow)."""
        from pyspark.sql import types as ST
        pattern, groups = self.pattern, self.groups
        tok_col = self.tokens_col
        names = [f.name for f in df.schema.fields]
        # pre-existing body/group columns are REPLACED (the fused path's
        # withColumn semantics) — keeping them would emit duplicate
        # column names and make downstream F.col() ambiguous
        replaced = {"body", *groups}
        keep = [i for i, n in enumerate(names) if n not in replaced]
        keep_names = [names[i] for i in keep]
        out_schema = ST.StructType(
            [df.schema.fields[i] for i in keep]
            + [ST.StructField("body", ST.StringType())]
            + [ST.StructField(g, ST.StringType()) for g in groups])
        tok_idx = names.index(tok_col)

        def fn(batches):
            import pyarrow as pa
            import pyarrow.compute as pc

            from opentelemetry_collector_contrib_spark.functions.tokens import (
                decode_arrow)
            for b in batches:
                body = decode_arrow(b.column(tok_idx))
                # Python-re '$' matches BEFORE one trailing newline; RE2
                # '$' is end-of-text only — strip a single trailing \n
                # for MATCHING (body itself stays raw) so the backends
                # agree on newline-terminated lines
                ex = pc.extract_regex(
                    pc.replace_substring_regex(body, r"\n$", ""),
                    pattern)  # null struct on miss
                arrays = ([b.column(i) for i in keep]
                          + [body]
                          + [pc.struct_field(ex, g) for g in groups])
                yield pa.RecordBatch.from_arrays(
                    arrays, [*keep_names, "body", *groups])

        return df.mapInArrow(fn, out_schema)

    def _extract_fused(self, df: DataFrame) -> DataFrame:
        """tokens -> struct(body, groups) in ONE Arrow hop (bulk numpy
        detokenize + one str.extract pass per batch)."""
        from ..functions.tokens import decode_batch
        pattern = self.pattern
        fields = ", ".join(f"{g}: string" for g in self.groups)

        @F.pandas_udf(f"struct<body: string, {fields}>")
        def decode_extract(tokens: pd.Series) -> pd.DataFrame:
            rx = _compiled(pattern)          # per-executor compile cache
            body = decode_batch(tokens)
            out = body.str.extract(rx)       # vectorized named-group extract
            out.columns = list(rx.groupindex.keys())
            out.insert(0, "body", body)
            return out

        df = df.withColumn("_g", decode_extract(F.col(self.tokens_col)))
        return df.withColumn("body", F.col("_g.body"))

    def _extract_pandas(self, df: DataFrame) -> DataFrame:
        pattern = self.pattern
        fields = ", ".join(f"{g}: string" for g in self.groups)

        @F.pandas_udf(f"struct<{fields}>")
        def extract(s: pd.Series) -> pd.DataFrame:
            rx = _compiled(pattern)          # per-executor compile cache
            out = s.str.extract(rx)          # vectorized named-group extract
            out.columns = list(rx.groupindex.keys())
            return out

        return df.withColumn("_g", extract(F.col(self.parse_from)))

    def _extract_native(self, df: DataFrame) -> DataFrame:
        # Spark regexp_extract returns '' on miss; use a match guard to
        # preserve NULL-on-miss so both backends agree exactly.
        rx = java_pattern(self.pattern)
        matched = F.col(self.parse_from).rlike(rx)
        cols = [
            F.when(matched,
                   F.regexp_extract(F.col(self.parse_from), rx,
                                    group_number(self.pattern, g))).alias(g)
            for g in self.groups
        ]
        return df.withColumn("_g", F.when(matched, F.struct(*cols)))

    # -- public -----------------------------------------------------------
    def apply(self, df: DataFrame) -> DataFrame:
        if self.backend == "arrow":
            df = self._extract_arrow(df)
            df = df.withColumn(
                "parsed", F.col(self.groups[0]).isNotNull())
        else:
            if self.backend == "fused":
                df = self._extract_fused(df)
            elif self.backend == "pandas":
                df = self._extract_pandas(df)
            else:
                df = self._extract_native(df)
            first = self.groups[0]
            df = df.withColumn("parsed", F.col(f"_g.{first}").isNotNull())
            for g in self.groups:
                df = df.withColumn(g, F.col(f"_g.{g}"))
            df = df.drop("_g")
        if self.timestamp_from:
            fmt = strptime_to_spark(self.timestamp_layout)
            # try_to_timestamp: ANSI mode throws on out-of-range dates
            # (e.g. month 13) that still match the regex — flag-don't-crash
            df = df.withColumn(
                "event_ts",
                F.try_to_timestamp(F.col(self.timestamp_from), F.lit(fmt)))
        if self.severity_from:
            sev = F.upper(F.col(self.severity_from))
            df = (df
                  .withColumn("severity_text", severity_text_expr(sev))
                  .withColumn("severity_number", severity_number_expr(sev)))
        return df

    __call__ = apply


def kv_extract(df: DataFrame, key: str, from_col: str = "body",
               out_col: str | None = None) -> DataFrame:
    """Extract one `key=value` pair from a line (stanza key_value_parser
    analog, single-key fast path).  NULL when absent."""
    out = out_col or key
    rx = rf"(?:^|\s){re.escape(key)}=(\S+)"
    val = F.regexp_extract(F.col(from_col), rx, 1)
    return df.withColumn(out, F.when(val != "", val))
