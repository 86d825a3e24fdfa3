"""Multiline recombine (operators/recombine.py) — stanza recombine
semantics: stack-trace reassembly, first/last modes, max_batch_size
chunking, and the one-exchange plan shape."""

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.operators.recombine import (
    recombine)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "src string, off bigint, tb string, line string")


def _run(df, mode="first", **kw):
    return recombine(df, ~F.col("line").startswith(" "),
                     ["src"], "off", "tb", mode=mode, **kw)


def test_stack_trace_reassembly_first(spark):
    df = _df(spark, [
        ("a", 1, "x", "ERROR boom"),
        ("a", 2, "x", "  at f1"),
        ("a", 3, "x", "  at f2"),
        ("a", 4, "x", "INFO ok"),
        ("b", 1, "x", "WARN w"),
    ])
    out = {(r["src"], r["entry_id"]): r.asDict()
           for r in _run(df).collect()}
    assert out[("a", 1)]["body"] == "ERROR boom\n  at f1\n  at f2"
    assert out[("a", 1)]["n_lines"] == 3
    assert out[("a", 1)]["first_off"] == 1
    assert out[("a", 2)]["body"] == "INFO ok"
    assert out[("b", 1)]["body"] == "WARN w"
    assert len(out) == 3


def test_leading_continuations_group_as_entry_zero(spark):
    df = _df(spark, [
        ("a", 1, "x", "  tail of a previous file chunk"),
        ("a", 2, "x", "  more tail"),
        ("a", 3, "x", "ERROR fresh"),
    ])
    out = {r["entry_id"]: r.asDict() for r in _run(df).collect()}
    assert out[0]["n_lines"] == 2
    assert out[1]["body"] == "ERROR fresh"


def test_mode_last_closes_entry_at_marker(spark):
    # predicate marks entry ENDS (e.g. a line ending the record)
    df = _df(spark, [
        ("a", 1, "x", "part1"),
        ("a", 2, "x", "part2 END"),
        ("a", 3, "x", "part3"),
        ("a", 4, "x", "part4 END"),
    ])
    out = recombine(df, F.col("line").endswith("END"), ["src"], "off",
                    "tb", mode="last")
    got = {r["entry_id"]: r["body"] for r in out.collect()}
    assert got == {0: "part1\npart2 END", 1: "part3\npart4 END"}


def test_max_lines_chunks_oversized_entries(spark):
    rows = [("a", 1, "x", "ERROR big")] + [
        ("a", i, "x", f"  at f{i}") for i in range(2, 8)]
    out = _run(_df(spark, rows), max_lines=3).collect()
    sizes = sorted(r["n_lines"] for r in out)
    assert sizes == [1, 3, 3]
    first = min(out, key=lambda r: r["first_off"])
    assert first["body"].startswith("ERROR big")


def test_tie_order_is_deterministic(spark):
    df = _df(spark, [
        ("a", 1, "b", "ERROR x"),
        ("a", 1, "a", "ERROR w"),  # same offset: tiebreak asc
    ])
    out = sorted(_run(df).collect(), key=lambda r: r["entry_id"])
    # both are markers -> two entries; running sum counts in
    # (off, tb) order, so 'ERROR w' (tb=a) is entry 1
    assert [r["body"] for r in out] == ["ERROR w", "ERROR x"]


def test_custom_sep_and_invalid_mode(spark):
    df = _df(spark, [("a", 1, "x", "ERROR e"), ("a", 2, "x", "  c")])
    out = _run(df, sep=" | ").collect()
    assert out[0]["body"] == "ERROR e |   c"
    with pytest.raises(ValueError):
        _run(df, mode="middle")


def test_single_exchange_plan(spark):
    """The grouped concat reuses the window's hashpartitioning(src)
    (subset rule) — exactly ONE shuffle for the whole recombine."""
    df = _df(spark, [("a", 1, "x", "ERROR e")])
    plan = (_run(df)._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 1
    assert "EvalPython" not in plan
