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

Three execution backends (identical output, tests assert equality):
- 'fused' (default, the north-star shape AND the fastest measured):
  ONE Arrow-batched pandas UDF taking the raw ``tokens`` column and
  returning struct(body, <named groups>) — bulk numpy detokenize +
  a single ``pd.Series.str.extract`` pass per batch.  One Python hop,
  one regex execution per row.  The regex is compiled once per
  executor (module-level cache), mirroring the reference's regex
  precompilation (carbonreceiver/protocol/regex_parser.go:118-160).
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
                 backend: str = "fused"):
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

    # -- backends ---------------------------------------------------------
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
