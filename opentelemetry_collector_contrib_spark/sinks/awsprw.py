"""awsprometheusremotewriteexporter analog: AWS SigV4 request signing.

The reference exporter is the upstream Prometheus remote-write exporter
wrapped in a SigV4-signing ``http.RoundTripper``
(``exporter/awsprometheusremotewriteexporter/auth.go:31-70``): each
outgoing request is cloned (shallow struct copy + deep header copy,
``auth.go:115-125``) and signed with the AWS SDK v4 signer over
(service, region, now).  The signer itself is the public AWS Signature
Version 4 algorithm; this module implements it from the published spec
so the semantics are testable without the SDK:

1. canonical request = method, canonical URI (RFC-3986 path, "/" when
   empty), canonical query (key-sorted, URI-encoded pairs), canonical
   headers (lowercased names, trimmed values, sorted), signed-header
   list, and the hex SHA-256 of the body.
2. string-to-sign = ``AWS4-HMAC-SHA256``, the ``YYYYMMDD'T'HHMMSS'Z'``
   timestamp, the ``date/region/service/aws4_request`` scope, and the
   hex SHA-256 of the canonical request.
3. signing key = chained HMAC-SHA256 over ``AWS4<secret>`` with date,
   region, service, ``aws4_request``; signature = hex HMAC of the
   string-to-sign.
4. the ``Authorization`` header carries algorithm, credential scope,
   signed headers and signature.

Gate semantics mirrored from the reference: signing only activates when
BOTH region and service are configured (``auth.go:112-114`` —
otherwise the round tripper passes through unchanged), and missing
credentials are an error (``auth.go:95-97``).

This is config/egress-plane (driver side, one call per HTTP flush —
never per row), so plain Python is the right altitude.
"""

from __future__ import annotations

import hashlib
import hmac
from urllib.parse import quote, urlsplit


def _hmac(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _uri_encode(s: str, encode_slash: bool = True) -> str:
    safe = "-_.~" if encode_slash else "-_.~/"
    return quote(s, safe=safe)


def canonical_request(method: str, url: str, headers: dict[str, str],
                      body: bytes) -> tuple[str, str]:
    """Returns (canonical_request, signed_headers)."""
    parts = urlsplit(url)
    path = parts.path or "/"
    canon_path = _uri_encode(path, encode_slash=False)
    # canonical query: split on & / =, URI-encode, sort by encoded pair
    pairs = []
    if parts.query:
        from urllib.parse import unquote
        for item in parts.query.split("&"):
            k, _, v = item.partition("=")
            # decode once, re-encode once: urlsplit leaves the query
            # percent-encoded, and encoding it again would double-encode
            # (%2F -> %252F) and break the server-side canonicalization
            pairs.append((_uri_encode(unquote(k)), _uri_encode(unquote(v))))
    canon_query = "&".join(f"{k}={v}" for k, v in sorted(pairs))
    hdrs = sorted((k.lower(), " ".join(v.split()))
                  for k, v in headers.items())
    canon_headers = "".join(f"{k}:{v}\n" for k, v in hdrs)
    signed = ";".join(k for k, _ in hdrs)
    payload_hash = hashlib.sha256(body).hexdigest()
    req = "\n".join([method.upper(), canon_path, canon_query,
                     canon_headers, signed, payload_hash])
    return req, signed


def string_to_sign(canon_req: str, amz_date: str, region: str,
                   service: str) -> tuple[str, str]:
    """Returns (string_to_sign, credential_scope)."""
    scope = f"{amz_date[:8]}/{region}/{service}/aws4_request"
    sts = "\n".join(["AWS4-HMAC-SHA256", amz_date, scope,
                     hashlib.sha256(canon_req.encode()).hexdigest()])
    return sts, scope


def signing_key(secret_key: str, date: str, region: str,
                service: str) -> bytes:
    k = _hmac(("AWS4" + secret_key).encode(), date)
    k = _hmac(k, region)
    k = _hmac(k, service)
    return _hmac(k, "aws4_request")


def sigv4_sign(method: str, url: str, headers: dict[str, str],
               body: bytes, region: str, service: str, amz_date: str,
               access_key: str, secret_key: str) -> dict[str, str]:
    """Sign a request; returns the NEW header map (the original is not
    mutated — the clone-then-sign discipline of ``cloneRequest``,
    auth.go:115-125 + RoundTrip:40-58).

    Passthrough gate (auth.go:112-114): with region or service empty the
    headers come back unchanged; missing credentials raise
    (auth.go:95-97).
    """
    if not region or not service:
        return dict(headers)
    if not access_key or not secret_key:
        raise ValueError("no AWS credentials exist")
    hdrs = dict(headers)
    lowered = {k.lower() for k in hdrs}
    # both defaults must be case-insensitive: a caller-supplied
    # 'X-Amz-Date' plus a setdefault'd 'x-amz-date' would sign the
    # header twice and invalidate the signature
    if "x-amz-date" not in lowered:
        hdrs["x-amz-date"] = amz_date
    if "host" not in lowered:
        hdrs["host"] = urlsplit(url).netloc
    canon, signed = canonical_request(method, url, hdrs, body)
    sts, scope = string_to_sign(canon, amz_date, region, service)
    sig = hmac.new(signing_key(secret_key, amz_date[:8], region, service),
                   sts.encode(), hashlib.sha256).hexdigest()
    hdrs["Authorization"] = (
        f"AWS4-HMAC-SHA256 Credential={access_key}/{scope}, "
        f"SignedHeaders={signed}, Signature={sig}")
    return hdrs
