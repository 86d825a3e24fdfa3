"""Grok compiler: expansion, recursion, sanitization, cycle guard, and
end-to-end parse behavior through RegexParser."""

import re

import pytest

from opentelemetry_collector_contrib_spark.operators.grok import (
    GROK_PATTERNS, grok_parser, grok_to_regex)


def test_named_and_bare_references_expand():
    rx = grok_to_regex("%{INT:n} %{WORD}", anchored=False)
    m = re.match(rx, "-42 hello")
    assert m and m.group("n") == "-42"
    assert m.groupdict() == {"n": "-42"}     # bare ref captures nothing


def test_recursion_through_custom_definitions():
    defs = {"KV": r"%{WORD:key}=%{NOTSPACE:val}"}
    rx = grok_to_regex("%{KV}", definitions=defs)
    m = re.match(rx, "a=1")
    assert m and m.group("key") == "a" and m.group("val") == "1"


def test_unknown_pattern_raises():
    with pytest.raises(KeyError):
        grok_to_regex("%{NOPE:x}")


def test_cycle_guard():
    with pytest.raises(ValueError):
        grok_to_regex("%{A}", definitions={"A": "%{B}", "B": "%{A}"})


def test_semantic_name_sanitized():
    rx = grok_to_regex("%{WORD:[log][level]}", anchored=False)
    assert re.match(rx, "info").group("log_level") == "info"


def test_library_patterns_are_re2_safe():
    # no backrefs / lookaround anywhere (the mapInArrow contract)
    for name, pat in GROK_PATTERNS.items():
        assert "(?=" not in pat and "(?!" not in pat and "\\1" not in pat, name
        re.compile(pat)


def test_grok_parse_flags_nonstandard_levels(spark):
    lines = [
        "2020-08-25 00:00:15 INFO all good",
        "2020-08-25 00:00:16 WEIRD not a level",
        "--- continuation line",
    ]
    df = spark.createDataFrame(
        [(i, [ord(c) for c in l]) for i, l in enumerate(lines)],
        "doc_id long, tokens array<int>")
    p = grok_parser("%{TIMESTAMP_ISO8601:gts} %{LOGLEVEL:lvl} %{GREEDYDATA:gmsg}",
                    timestamp_from=None, severity_from=None)
    got = {r["doc_id"]: (r["parsed"], r["lvl"])
           for r in p.apply(df).collect()}
    assert got[0] == (True, "INFO")
    assert got[1][0] is False and got[2][0] is False
