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
