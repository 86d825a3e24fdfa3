"""Transform-statement DSL — the stanza expression-language / OTTL-style
surface, re-expressed over Catalyst.

The reference's stanza operators reference an expression language for
filter/router operators (receiver/stanzareceiver/README.md:34, impl in
the stanza dep), and the routing template extracts values and routes on
them (processor/routingprocessor/routing.go:163-182).  This module
gives the same config-level power as a list of statements compiled to
DataFrame operations; every value/condition is a Spark SQL expression,
so predicates stay Catalyst-compiled (pushdown, codegen) — nothing is
interpreted per row.

Supported statements (one per line / list item)::

    set(target, <sql expr>) [where <sql cond>]
    delete(target) [where <sql cond>]
    rename(old, new)
    truncate(target, N) [where <sql cond>]
    replace_pattern(target, 'regex', 'replacement') [where <sql cond>]
    keep_keys(map_target, 'k1', 'k2', ...)
    drop() where <sql cond>            # drop matching ROWS

``where`` guards apply per row; an unguarded statement applies to all.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STMT_RX = re.compile(
    r"^\s*(?P<fn>[a-z_]+)\s*\((?P<args>.*)\)\s*"
    r"(?:where\s+(?P<cond>.+?))?\s*$", re.DOTALL)


@dataclass
class Statement:
    fn: str
    args: list[str]
    cond: str | None


def _split_args(s: str) -> list[str]:
    """Split on top-level commas (respecting quotes and parens)."""
    out, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return [a for a in out if a]


def parse_statement(text: str) -> Statement:
    m = _STMT_RX.match(text)
    if not m:
        raise ValueError(f"unparseable transform statement: {text!r}")
    return Statement(m.group("fn"), _split_args(m.group("args")),
                     m.group("cond"))


def _unquote(s: str) -> str:
    if len(s) >= 2 and s[0] == s[-1] and s[0] in "'\"":
        return s[1:-1]
    return s


def apply_statement(df: DataFrame, st: Statement) -> DataFrame:
    cond = F.expr(st.cond) if st.cond else None

    def guarded(new_col, target):
        if cond is None:
            return new_col
        old = (F.col(target) if target in df.columns
               else F.lit(None).cast("string"))
        return F.when(cond, new_col).otherwise(old)

    if st.fn == "set":
        target, value = st.args[0], st.args[1]
        return df.withColumn(target, guarded(F.expr(value), target))
    if st.fn == "delete":
        (target,) = st.args
        if cond is None:
            return df.drop(target)
        return df.withColumn(
            target, F.when(cond, F.lit(None)).otherwise(F.col(target)))
    if st.fn == "rename":
        old, new = st.args
        return df.withColumnRenamed(old, new)
    if st.fn == "truncate":
        target, n = st.args[0], int(st.args[1])
        return df.withColumn(
            target, guarded(F.substring(F.col(target), 1, n), target))
    if st.fn == "replace_pattern":
        target, rx, repl = (st.args[0], _unquote(st.args[1]),
                            _unquote(st.args[2]))
        return df.withColumn(
            target,
            guarded(F.regexp_replace(F.col(target), rx, repl), target))
    if st.fn == "keep_keys":
        target = st.args[0]
        keys = [_unquote(k) for k in st.args[1:]]
        keys_arr = F.array(*[F.lit(k) for k in keys])
        return df.withColumn(
            target,
            F.map_filter(F.col(target),
                         lambda k, v: F.array_contains(keys_arr, k)))
    if st.fn == "drop":
        if cond is None:
            raise ValueError("drop() requires a where clause")
        return df.filter(~cond | cond.isNull())
    raise ValueError(f"unknown transform function {st.fn!r}")


def transform(df: DataFrame, statements: list[str]) -> DataFrame:
    """Apply a statement list in order (the OTTL statement sequence)."""
    for text in statements:
        df = apply_statement(df, parse_statement(text))
    return df
