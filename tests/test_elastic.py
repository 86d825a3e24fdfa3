"""elastic exporter analog — Java stacktrace parsing goldens."""

from opentelemetry_collector_contrib_spark.operators.elastic import (
    exception_errors, parse_java_stacktrace)

TRACE = (
    "java.lang.RuntimeException: boom\n"
    "\tat com.example/app.Main.run(Main.java:10)\n"
    "\tat app.Util.call(Util.java)\n"
    "\tSuppressed: java.lang.Exception: sup\n"
    "\t\tat app.Sup.x(Sup.java:1)\n"
    "\tat loader/mod/pkg.Cls.m(Cls.java:3)\n"
    "Caused by: java.io.IOException: io\n"
    "\tat app.IO.read(IO.java:7)\n"
    "\t... 2 more\n")


def test_parse_java_stacktrace_chain():
    chain = parse_java_stacktrace(TRACE)
    assert chain is not None and len(chain) == 2
    outer, cause = chain
    # suppressed block ignored — including the frame AFTER it at the
    # same indent as "Suppressed:" itself (the reference pops only on
    # strictly shallower indent, so that frame joins the throwaway)
    assert outer["frames"] == [
        ("com.example", "app.Main", "run", "Main.java", 10),
        ("", "app.Util", "call", "Util.java", 0),
    ]
    assert cause["message"] == "java.io.IOException: io"
    # "... 2 more" copies the LAST TWO enclosing frames
    assert cause["frames"] == [("", "app.IO", "read", "IO.java", 7),
                               outer["frames"][-2], outer["frames"][-1]]


def test_parse_errors_return_none():
    assert parse_java_stacktrace("Ex\n\tgarbage\n") is None
    assert parse_java_stacktrace("Ex\n\t... 1 more\n") is None  # no enclosing
    assert parse_java_stacktrace("Ex\n\nat a.b(c)\n") is None   # blank line


def test_exception_errors_rows(spark):
    rows = [
        (1, "t1", "s1", "RuntimeException", "boom", TRACE, True, "java"),
        (2, "t2", "s2", "E2", "", None, False, "java"),       # no trace
        (3, "t3", "s3", "E3", "m", "panic:\ngoroutine", False, "go"),
    ]
    df = spark.createDataFrame(
        rows, "ts_ns long, trace_id string, span_id string, "
        "exc_type string, exc_message string, exc_stacktrace string, "
        "exc_escaped boolean, language string")
    got = {(r["trace_id"], r["depth"]): r.asDict()
           for r in exception_errors(df).collect()}
    assert len(got) == 4
    outer = got[("t1", 0)]
    assert outer["type"] == "RuntimeException"
    assert outer["message"] == "boom" and outer["handled"] is False
    assert outer["n_frames"] == 2
    cause = got[("t1", 1)]
    assert cause["type"] is None
    assert cause["message"] == "java.io.IOException: io"
    assert cause["n_frames"] == 3
    assert got[("t2", 0)]["message"] == "[EMPTY]"       # empty -> [EMPTY]
    assert got[("t2", 0)]["raw_stacktrace"] is None     # absent trace: no attr
    go = got[("t3", 0)]
    assert go["raw_stacktrace"] == "panic:\ngoroutine"  # non-java fallback
    assert go["handled"] is True
