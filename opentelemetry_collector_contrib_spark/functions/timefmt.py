"""strptime-layout -> Spark datetime-pattern translation.

The stanza parsers configure timestamps with strptime layouts
(``timestamp: {parse_from, layout: '%Y-%m-%d'}`` —
receiver/stanzareceiver/e2e_test.go:95-97, README.md:30-34).  Spark's
``to_timestamp`` takes java.time patterns, so config-driven pipelines
need this translation once, at plan-build time (never per row).
"""

from __future__ import annotations

# strptime directive -> java.time DateTimeFormatter pattern
_MAP = {
    "%Y": "yyyy",
    "%y": "yy",
    "%m": "MM",
    "%d": "dd",
    "%H": "HH",
    "%I": "hh",
    "%M": "mm",
    "%S": "ss",
    "%f": "SSSSSS",
    "%L": "SSS",
    "%j": "DDD",
    "%p": "a",
    "%z": "xx",
    "%Z": "zzz",
    "%a": "EEE",
    "%A": "EEEE",
    "%b": "MMM",
    "%B": "MMMM",
    "%%": "%",
}

# characters java.time treats as pattern letters -> must be quoted
_JAVA_LETTERS = set("GuyDMLdQqYwWEecFahKkHmsSAnNVzOXxZ")


def strptime_to_spark(layout: str) -> str:
    """Translate a strptime layout (e.g. '%Y-%m-%d %H:%M:%S') to a Spark
    datetime pattern ('yyyy-MM-dd HH:mm:ss')."""
    out: list[str] = []
    i = 0
    while i < len(layout):
        ch = layout[i]
        if ch == "%" and i + 1 < len(layout):
            directive = layout[i:i + 2]
            if directive not in _MAP:
                raise ValueError(f"unsupported strptime directive {directive!r}")
            out.append(_MAP[directive])
            i += 2
        else:
            if ch in _JAVA_LETTERS:
                out.append(f"'{ch}'")
            else:
                out.append(ch)
            i += 1
    return "".join(out)
