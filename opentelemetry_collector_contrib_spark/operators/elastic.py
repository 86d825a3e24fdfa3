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


# ---------------------------------------------------------------------------
# span / transaction mapping (translator/elastic/traces.go)
# ---------------------------------------------------------------------------

def _url_parts(url):
    """Split a well-formed absolute-or-relative http(s) URL into
    (scheme, hostport, path, query) Columns — the url.Parse subset the
    synthesized/contracted inputs use (no IPv6 literals, no userinfo)."""
    is_abs = url.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    scheme = F.when(is_abs,
                    F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.when(is_abs,
                      F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    path = F.when(is_abs,
                  F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)) \
        .otherwise(F.regexp_extract(url, r"^([^?#]*)", 1))
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    return scheme, hostport, path, query


def _hostname(hostport):
    return F.regexp_extract(hostport, r"^([^:]*)", 1)


def _port_str(hostport):
    return F.regexp_extract(hostport, r":([0-9]+)$", 1)


def _default_port(scheme):
    """schemeDefaultPort (traces.go:607-615)."""
    return (F.when(scheme == "http", F.lit(80))
            .when(scheme == "https", F.lit(443)).otherwise(F.lit(0)))


def elastic_spans(df: DataFrame) -> DataFrame:
    """EncodeSpan (traces.go:38-98): root spans and SERVER spans become
    transactions; everything else becomes a span.

    Mirrored semantics (attribute inputs arrive key-flattened):
    - outcome: status 1→success, 2→failure, else '' (:616-625);
      transaction result OK/Error (:195-200);
    - transaction type 'request' when any request attribute is present
      (method/url/target/host/scheme/flavor/server_name), else
      'unknown' (:202-204); URL protocol failsafe 'http' (:205-210);
      hostname/port fall back to net.host.* (:211-216); socket remote
      address from net.peer.ip [+port] (:217-223).  The reference
      iterates a Go map, so conflicting attrs (http.url host vs
      http.host) resolve nondeterministically there; here precedence is
      fixed: absolute http.url > http.host > http.server_name;
    - span type app / external+http / db (:292-351); URL host composed
      from net.peer.name|ip [+port] when the URL lacks one (:313-326);
      destination.address = URL hostname else net.peer.name else
      net.peer.ip, destination.port = URL port else scheme default
      (:286-290, :305-312); destination.service URL/resource with the
      default-port rules of elastic/apm#180 (:328-338): an explicit
      default port is stripped from the service URL, an implicit one
      is appended to the resource; db spans overwrite the destination
      service with db.system (:340-347).
    """
    # The mapping is staged into sequential ``select``s with NAMED
    # intermediate columns.  A single flat projection duplicated the
    # hostport/port regexp extractions into every CASE arm and blew the
    # JVM's 64 KB generated-method limit ("ERROR CodeGenerator: … Code
    # grows beyond 64 KB"), silently falling back to interpreted
    # evaluation.  Catalyst's CollapseProject keeps a non-cheap alias
    # that is referenced more than once as its own projection, so each
    # stage's codegen unit stays small and every shared subexpression
    # is computed exactly once.
    root = F.coalesce(F.col("parent_span_id"), F.lit("")) == ""
    is_tx = root | (F.lower(F.coalesce(F.col("kind"), F.lit(""))) == "server")
    code = F.col("status_code")
    outcome = (F.when(code == 1, F.lit("success"))
               .when(code == 2, F.lit("failure")).otherwise(F.lit("")))
    duration_ms = ((F.col("end_ns") - F.col("start_ns")).cast("double")
                   / F.lit(1_000_000.0))

    url = F.coalesce(F.col("http_url"), F.col("http_target"))
    u_scheme, u_hostport, u_path, u_query = _url_parts(url)
    has_url_ctx = (F.col("http_url").isNotNull()
                   | F.col("http_target").isNotNull()
                   | F.col("http_scheme").isNotNull()
                   | F.col("http_host").isNotNull())
    req_present = (F.col("http_method").isNotNull()
                   | F.col("http_url").isNotNull()
                   | F.col("http_target").isNotNull()
                   | F.col("http_host").isNotNull()
                   | F.col("http_scheme").isNotNull()
                   | F.col("http_flavor").isNotNull()
                   | F.col("http_server_name").isNotNull())
    db_present = (F.col("db_system").isNotNull()
                  | F.col("db_name").isNotNull()
                  | F.col("db_statement").isNotNull()
                  | F.col("db_user").isNotNull())
    peer_addr = F.coalesce(
        F.when(F.coalesce(F.col("net_peer_name"), F.lit("")) != "",
               F.col("net_peer_name")), F.col("net_peer_ip"))
    peer_port = F.coalesce(F.col("net_peer_port"), F.lit(0))
    s1 = df.select(
        "*",
        u_scheme.alias("_u_scheme"), u_hostport.alias("_u_hostport"),
        u_path.alias("_u_path"), u_query.alias("_u_query"),
        url.isNotNull().alias("_has_url"),
        has_url_ctx.alias("_has_url_ctx"), req_present.alias("_req_present"),
        db_present.alias("_db_present"),
        peer_addr.alias("_peer_addr"), peer_port.alias("_peer_port"),
        _port_str(F.col("http_host")).alias("_hh_port"))

    s2 = s1.select(
        "*",
        _hostname(F.col("_u_hostport")).alias("_u_host"),
        _port_str(F.col("_u_hostport")).alias("_u_port"),
        F.coalesce(
            F.when(F.coalesce(F.col("_u_hostport"), F.lit("")) != "",
                   F.col("_u_hostport")),
            F.col("http_host")).alias("_url_host0"),
        F.when(
            F.col("_peer_port") > 0,
            F.concat(F.col("_peer_addr"), F.lit(":"),
                     F.col("_peer_port").cast("string"))
        ).otherwise(F.col("_peer_addr")).alias("_composed_host"))

    sp_scheme0 = F.coalesce(F.col("_u_scheme"), F.col("http_scheme"))
    s3 = s2.select(
        "*",
        F.when(F.coalesce(sp_scheme0, F.lit("")) == "",
               F.lit("http")).otherwise(sp_scheme0).alias("_sp_scheme"),
        F.coalesce(
            F.col("_url_host0"),
            F.when(F.coalesce(F.col("_peer_addr"), F.lit("")) != "",
                   F.col("_composed_host"))).alias("_url_host"),
        _port_str(F.col("_url_host0")).alias("_uh0_port"),
        (F.coalesce(F.col("_url_host0"), F.lit("")) != "").alias("_has_uh0"))

    s4 = s3.select(
        "*",
        (F.coalesce(_port_str(F.col("_url_host")), F.lit("")) != "")
        .alias("_url_has_port"),
        _default_port(F.col("_sp_scheme")).alias("_def_port"))

    dest_port = (
        F.when(F.col("_has_uh0"),
               F.when(F.col("_url_has_port"),
                      F.col("_uh0_port").cast("int"))
               .otherwise(F.col("_def_port")))
        .when(F.coalesce(F.col("_peer_addr"), F.lit("")) != "",
              F.when(F.col("_peer_port") > 0, F.col("_peer_port"))
              .otherwise(F.col("_def_port")))
        .otherwise(F.col("_peer_port")))
    s5 = s4.select(
        "*",
        dest_port.alias("_dest_port"),
        F.when(F.col("_has_uh0"), _hostname(F.col("_url_host0")))
        .otherwise(F.col("_peer_addr")).alias("_dest_addr"))

    # destination.service rules (traces.go:328-338)
    is_default_port = ((F.col("_dest_port") != 0)
                       & (F.col("_dest_port") == F.col("_def_port")))
    s6 = s5.select(
        "*",
        F.when(
            is_default_port & F.col("_url_has_port"),
            F.concat(F.col("_sp_scheme"), F.lit("://"),
                     _hostname(F.col("_url_host")))
        ).otherwise(F.concat(F.col("_sp_scheme"), F.lit("://"),
                             F.col("_url_host"))).alias("_svc_url"),
        F.when(
            is_default_port & ~F.col("_url_has_port"),
            F.concat(F.col("_url_host"), F.lit(":"),
                     F.col("_dest_port").cast("string"))
        ).otherwise(F.col("_url_host")).alias("_svc_resource"))

    # ---- transaction side --------------------------------------------------
    req = F.col("_req_present")
    tx_type = F.when(req, F.lit("request")).otherwise(F.lit("unknown"))
    tx_proto = F.when(req,
                      F.when(F.coalesce(sp_scheme0, F.lit("")) == "",
                             F.lit("http")).otherwise(sp_scheme0))
    tx_hostname0 = F.coalesce(
        F.when(F.coalesce(F.col("_u_host"), F.lit("")) != "",
               F.col("_u_host")),
        F.when(F.col("http_host").isNotNull(),
               _hostname(F.col("http_host"))),
        F.col("http_server_name"))
    tx_hostname = F.when(req,
                         F.when(F.coalesce(tx_hostname0, F.lit("")) == "",
                                F.col("net_host_name"))
                         .otherwise(tx_hostname0))
    tx_port0 = F.coalesce(
        F.when(F.coalesce(F.col("_u_port"), F.lit("")) != "",
               F.col("_u_port")),
        F.when(F.col("http_host").isNotNull(),
               F.when(F.col("_hh_port") != "", F.col("_hh_port"))))
    tx_port = F.when(req,
                     F.when(F.coalesce(tx_port0, F.lit("")) == "",
                            F.when(F.col("net_host_port") > 0,
                                   F.col("net_host_port").cast("string")))
                     .otherwise(tx_port0))
    remote = F.when(req & F.col("net_peer_ip").isNotNull(),
                    F.when(F.col("net_peer_port") > 0,
                           F.concat(F.col("net_peer_ip"), F.lit(":"),
                                    F.col("net_peer_port").cast("string")))
                    .otherwise(F.col("net_peer_ip")))

    # ---- span side ---------------------------------------------------------
    http_present = (F.col("_has_url_ctx")
                    | F.col("http_status_code").isNotNull())
    dbp = F.col("_db_present")
    span_type = (F.when(dbp, F.lit("db"))
                 .when(http_present, F.lit("external"))
                 .otherwise(F.lit("app")))
    span_subtype = (F.when(dbp, F.col("db_system"))
                    .when(http_present, F.lit("http")))
    url_ctx_host = F.col("_has_url_ctx") & F.col("_url_host").isNotNull()
    dest_service_name = F.when(
        dbp, F.when(F.coalesce(F.col("db_system"), F.lit("")) != "",
                    F.col("db_system"))
    ).otherwise(F.when(url_ctx_host, F.col("_svc_url")))
    dest_service_resource = F.when(
        dbp, F.when(F.coalesce(F.col("db_system"), F.lit("")) != "",
                    F.col("db_system"))
    ).otherwise(F.when(url_ctx_host, F.col("_svc_resource")))
    has_peer = F.coalesce(F.col("_peer_addr"), F.lit("")) != ""
    final_dest_addr = F.when(url_ctx_host, F.col("_dest_addr")) \
        .otherwise(F.when(has_peer, F.col("_peer_addr")))
    final_dest_port = F.when(url_ctx_host, F.col("_dest_port")) \
        .otherwise(F.when(has_peer, F.col("_peer_port")))

    NS = F.lit(None).cast("string")
    NI = F.lit(None).cast("int")
    tx = s6.filter(is_tx).select(
        F.lit("transaction").alias("kind_row"),
        "trace_id", "span_id",
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parent_id"),
        "name", F.col("start_ns").cast("bigint").alias("ts_ns"),
        duration_ms.alias("duration_ms"), outcome.alias("outcome"),
        F.when(code == 1, F.lit("OK")).when(code == 2, F.lit("Error"))
        .alias("result"),
        tx_type.alias("tx_type"),
        tx_proto.alias("url_protocol"), tx_hostname.alias("url_hostname"),
        tx_port.alias("url_port"),
        F.when(req & F.col("_has_url"), F.col("_u_path")).alias("url_path"),
        F.when(req & F.col("_has_url"), F.col("_u_query"))
        .alias("url_search"),
        F.col("http_status_code").cast("int").alias("status_code"),
        F.col("http_flavor").alias("http_version"),
        remote.alias("remote_addr"),
        NS.alias("span_type"), NS.alias("span_subtype"),
        NS.alias("dest_addr"), NI.alias("dest_port"),
        NS.alias("dest_service_name"), NS.alias("dest_service_resource"))
    sp = s6.filter(~is_tx).select(
        F.lit("span").alias("kind_row"),
        "trace_id", "span_id",
        F.coalesce(F.col("parent_span_id"), F.lit("")).alias("parent_id"),
        "name", F.col("start_ns").cast("bigint").alias("ts_ns"),
        duration_ms.alias("duration_ms"), outcome.alias("outcome"),
        NS.alias("result"), NS.alias("tx_type"),
        NS.alias("url_protocol"), NS.alias("url_hostname"),
        NS.alias("url_port"), NS.alias("url_path"), NS.alias("url_search"),
        F.col("http_status_code").cast("int").alias("status_code"),
        NS.alias("http_version"), NS.alias("remote_addr"),
        span_type.alias("span_type"), span_subtype.alias("span_subtype"),
        final_dest_addr.alias("dest_addr"),
        final_dest_port.cast("int").alias("dest_port"),
        dest_service_name.alias("dest_service_name"),
        dest_service_resource.alias("dest_service_resource"))
    return tx.unionByName(sp)
