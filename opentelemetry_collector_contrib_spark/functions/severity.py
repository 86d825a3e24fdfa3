"""Severity mapping — the stanza->pdata severity table.

Reference: receiver/stanzareceiver/converter.go:167-217 (convertSeverity).
Stanza's named levels (entry.Severity: Trace=10 Debug=20 Info=30 Notice=40
Warning=50 Error=60 Critical=70 Alert=80 Emergency=90 Catastrophe=100) map
to OTel (SeverityText, SeverityNumber) pairs; unknown / unparsed input maps
to ("Undefined", 0) — the default arm of converter.go:215-216.

We key the table by the upper-cased severity token extracted from the log
line (the regex parser's ``sev`` capture group), which is how the stanza
severity parser resolves named levels before convert() runs.

Implemented as a chained CASE (pure Catalyst expression — stays inside
whole-stage codegen; no UDF) and as an equivalent ANSI-SQL CASE string for
the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# severity token -> (SeverityText, SeverityNumber)  [converter.go:170-191]
SEVERITY_TABLE: dict[str, tuple[str, int]] = {
    "CATASTROPHE": ("Fatal", 24),   # SeverityNumberFATAL4
    "EMERGENCY":   ("Error", 21),   # SeverityNumberFATAL
    "ALERT":       ("Error", 19),   # SeverityNumberERROR3
    "CRITICAL":    ("Error", 18),   # SeverityNumberERROR2
    "ERROR":       ("Error", 17),   # SeverityNumberERROR
    "WARNING":     ("Info", 12),    # SeverityNumberINFO4
    "NOTICE":      ("Info", 11),    # SeverityNumberINFO3
    "INFO":        ("Info", 9),     # SeverityNumberINFO
    "DEBUG":       ("Debug", 5),    # SeverityNumberDEBUG
    "TRACE":       ("Trace", 2),    # SeverityNumberTRACE2
}

_UNDEFINED = ("Undefined", 0)  # converter.go:215-216


def severity_text_expr(sev_col: Column) -> Column:
    """OTel SeverityText for an upper-cased severity token column."""
    expr = None
    for token, (text, _num) in SEVERITY_TABLE.items():
        cond = sev_col == token
        expr = F.when(cond, text) if expr is None else expr.when(cond, text)
    return expr.otherwise(_UNDEFINED[0])


def severity_number_expr(sev_col: Column) -> Column:
    """OTel SeverityNumber (int) for an upper-cased severity token column."""
    expr = None
    for token, (_text, num) in SEVERITY_TABLE.items():
        cond = sev_col == token
        expr = F.when(cond, num) if expr is None else expr.when(cond, num)
    return expr.otherwise(_UNDEFINED[1]).cast("int")


def severity_case_sql(col_sql: str, which: str) -> str:
    """ANSI-SQL CASE equivalent, for the DuckDB oracle.

    ``which`` is 'text' or 'number'.
    """
    arms = []
    for token, (text, num) in SEVERITY_TABLE.items():
        val = f"'{text}'" if which == "text" else str(num)
        arms.append(f"WHEN {col_sql} = '{token}' THEN {val}")
    default = f"'{_UNDEFINED[0]}'" if which == "text" else str(_UNDEFINED[1])
    body = " ".join(arms)
    cast = "" if which == "text" else "::INT"
    return f"(CASE {body} ELSE {default} END){cast}"


# stanza numeric severity scale (entry.Severity): Default=0, Trace=10,
# Debug=20, Info=30, Notice=40, Warning=50, Error=60, Critical=70,
# Alert=80, Emergency=90, Catastrophe=100
_LEVELS = {"default": 0, "trace": 10, "debug": 20, "info": 30, "notice": 40,
           "warning": 50, "error": 60, "critical": 70, "alert": 80,
           "emergency": 90, "catastrophe": 100}

# (condition kind, level, text, number): the full convertSeverity switch
# (converter.go:167-217) — exact named levels first, then the custom-
# level range buckets (s > X), in source order.
_LEVEL_SWITCH: list[tuple[str, int, str, int]] = [
    ("eq", 100, "Fatal", 24),   # Catastrophe -> FATAL4
    ("eq", 90, "Error", 21),    # Emergency   -> FATAL
    ("eq", 80, "Error", 19),    # Alert       -> ERROR3
    ("eq", 70, "Error", 18),    # Critical    -> ERROR2
    ("eq", 60, "Error", 17),    # Error       -> ERROR
    ("eq", 50, "Info", 12),     # Warning     -> INFO4
    ("eq", 40, "Info", 11),     # Notice      -> INFO3
    ("eq", 30, "Info", 9),      # Info        -> INFO
    ("eq", 20, "Debug", 5),     # Debug       -> DEBUG
    ("eq", 10, "Trace", 2),     # Trace       -> TRACE2
    ("gt", 90, "Fatal", 22),    # > Emergency -> FATAL2
    ("gt", 80, "Error", 20),    # > Alert     -> ERROR4
    ("gt", 70, "Error", 19),    # > Critical  -> ERROR3
    ("gt", 60, "Error", 18),    # > Error     -> ERROR2
    ("gt", 50, "Info", 12),     # > Warning   -> INFO4
    ("gt", 40, "Info", 11),     # > Notice    -> INFO3
    ("gt", 30, "Info", 10),     # > Info      -> INFO2
    ("gt", 20, "Debug", 6),     # > Debug     -> DEBUG2
    ("gt", 10, "Trace", 3),     # > Trace     -> TRACE3
    ("gt", 0, "Trace", 1),      # > Default   -> TRACE
]


def convert_severity_level(level: int) -> tuple[str, int]:
    """Pure-Python twin of convertSeverity (converter.go:167-217) over
    the stanza numeric scale — used by tests as the oracle."""
    for kind, lv, text, num in _LEVEL_SWITCH:
        if (kind == "eq" and level == lv) or (kind == "gt" and level > lv):
            return text, num
    return _UNDEFINED


def severity_from_level_expr(level_col: Column, which: str) -> Column:
    """Range-bucketing severity conversion for NUMERIC stanza levels —
    covers custom levels between the named ones (converter.go:193-214).
    ``which`` is 'text' or 'number'; a chained CASE, pure codegen."""
    expr = None
    for kind, lv, text, num in _LEVEL_SWITCH:
        cond = (level_col == lv) if kind == "eq" else (level_col > lv)
        val = text if which == "text" else num
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    default = _UNDEFINED[0] if which == "text" else _UNDEFINED[1]
    out = expr.otherwise(F.lit(default))
    return out if which == "text" else out.cast("int")
