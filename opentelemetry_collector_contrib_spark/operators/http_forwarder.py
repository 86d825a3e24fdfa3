"""httpforwarder extension analog — request-rewrite semantics.

Reference: extension/httpforwarder/extension.go:62-106 — each incoming
request is cloned, its URL host/scheme swapped to the egress endpoint,
the configured egress headers are Add-ed, and a ``Via: <proto> <host>``
header is appended for tracking (MDN Via); empty egress endpoint is a
config error (extension.go:110-112).

Batch analog: the transport (listener/client) is out of scope; the
deterministic request transform IS the semantics — applied here as a
pure-Catalyst row transform over a requests table.  Header ``Add`` on
an existing key follows RFC 7230 §3.2.2 list combination (old value,
comma-space, new value) — exactly what Go emits on the wire for
repeated header fields.

Scale: zero exchanges, zero Python — string/map expressions only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_URL_RX = re.compile(r"^[a-z][a-z0-9+.-]*://[^/?#]+", re.IGNORECASE)


def _header_add(headers, key: str, value):
    """Go http.Header.Add as a map<string,string> transform: append to
    the existing comma-joined value list, else insert.  Matching is
    CASE-INSENSITIVE (Go canonicalizes header field names — an incoming
    'via' or 'x-tenant' merges into the canonical-cased key instead of
    surviving as a duplicate entry); any existing case-variants fold
    into one canonical entry, values joined in map order."""
    kl = key.lower()
    matches = F.map_filter(headers, lambda k, _: F.lower(k) == F.lit(kl))
    joined = F.array_join(F.map_values(matches), ", ")
    merged = F.when(F.size(F.map_keys(matches)) > 0,
                    F.concat(joined, F.lit(", "), value)) \
              .otherwise(value)
    kept = F.map_filter(headers, lambda k, _: F.lower(k) != F.lit(kl))
    return F.map_concat(
        kept, F.map_from_arrays(F.array(F.lit(key)), F.array(merged)))


def forward_requests(df: DataFrame, egress_endpoint: str,
                     extra_headers: dict[str, str] | None = None,
                     url_col: str = "url", proto_col: str = "proto",
                     host_col: str = "host",
                     headers_col: str = "headers") -> DataFrame:
    """Apply the forwarder's request rewrite.

    Adds ``fwd_url`` (scheme+authority replaced by the egress
    endpoint, path/query kept — extension.go:63-68), ``fwd_host``
    (the egress authority), and rewrites ``headers_col`` with the
    egress headers Add-ed (extension.go:71-73) then
    ``Via: <proto> <incoming host>`` appended (extension.go:77,106).
    """
    if not egress_endpoint:
        raise ValueError("'egress.endpoint' config option cannot be empty")
    m = _URL_RX.match(egress_endpoint)
    if not m:
        raise ValueError(
            f"enter a valid URL for 'egress.endpoint': {egress_endpoint!r}")
    egress_base = m.group(0)
    fwd_host = egress_base.split("://", 1)[1]

    # (?i): _URL_RX validates egress config with re.IGNORECASE; the JVM
    # regexp must match the same case-insensitively or an uppercase
    # scheme (HTTP://...) would silently keep its original host
    fwd_url = F.regexp_replace(
        F.col(url_col), "(?i)" + _URL_RX.pattern,
        egress_base.replace("$", r"\$"))
    headers = F.col(headers_col)
    for k, v in (extra_headers or {}).items():
        headers = _header_add(headers, k, F.lit(v))
    via = F.concat(F.col(proto_col), F.lit(" "), F.col(host_col))
    headers = _header_add(headers, "Via", via)
    return (df.withColumn("fwd_url", fwd_url)
            .withColumn("fwd_host", F.lit(fwd_host))
            .withColumn(headers_col, headers))
