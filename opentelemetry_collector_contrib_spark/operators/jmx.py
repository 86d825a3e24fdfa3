"""jmxreceiver config plane: JMX Metric Gatherer property assembly.

The reference receiver has no data-plane translation of its own — it
launches the JMX Metric Gatherer uber-JAR and receives OTLP back
(``receiver/jmxreceiver/receiver.go:59-88``).  What IS deterministic
semantics worth parity-checking is the config it synthesizes:

- endpoint coercion (``receiver.go:132-149``): anything that is not
  already a ``service:jmx:`` URL is parsed as host:port and rewritten
  to ``service:jmx:rmi:///jndi/rmi://<host>:<port>/jmxrmi``; a
  malformed endpoint is an error.
- properties document (``receiver.go:151-175``): field order is fixed
  (service.url, interval.milliseconds, then EITHER target.system or —
  only if target is empty — groovy.script, then exporter block, then
  username/password only when non-empty).
- subprocess invocation (``receiver.go:69-73``): ``java
  -Dorg.slf4j.simpleLogger.defaultLogLevel=debug -jar <jar> -config -``
  with the properties piped on stdin.
- validation (``config.go:74-97``): endpoint required; one of
  target_system/groovy_script required; non-negative interval/timeout.

These are pure functions; ``jmx_service_url_column`` is the Catalyst
twin used when a fleet of per-endpoint receiver configs is derived
from a discovery table (receivercreator-style) — a narrow projection,
no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def jmx_service_url(endpoint: str) -> str:
    """receiver.go:132-149 endpoint coercion."""
    if endpoint.startswith("service:jmx:"):
        return endpoint
    host, sep, port = endpoint.rpartition(":")
    if not sep or not host or not port.isdigit():
        raise ValueError(f'failed to parse Endpoint "{endpoint}"')
    return f"service:jmx:rmi:///jndi/rmi://{host}:{int(port)}/jmxrmi"


def jmx_service_url_column(endpoint):
    """Catalyst twin of ``jmx_service_url`` (malformed rows yield null
    instead of raising — the batch analog of the per-receiver error)."""
    host = F.regexp_extract(endpoint, r"^(.*):([0-9]+)$", 1)
    port = F.regexp_extract(endpoint, r"^(.*):([0-9]+)$", 2)
    ok = endpoint.rlike("^.+:[0-9]+$")
    return (F.when(endpoint.startswith("service:jmx:"), endpoint)
            .when(ok, F.concat(F.lit("service:jmx:rmi:///jndi/rmi://"),
                               host, F.lit(":"), port.cast("int"),
                               F.lit("/jmxrmi")))
            .otherwise(F.lit(None)))


def validate_jmx_config(cfg: dict) -> None:
    """config.go:74-97."""
    missing = []
    if not cfg.get("endpoint"):
        missing.append("`endpoint`")
    if not cfg.get("target_system") and not cfg.get("groovy_script"):
        missing.append("`target_system` or `groovy_script`")
    if missing:
        plural = "s" if len(missing) > 1 else ""
        raise ValueError(
            f"{cfg.get('name', 'jmx')}: missing required field{plural}: "
            + ", ".join(missing))
    if cfg.get("collection_interval_ms", 10000) < 0:
        raise ValueError("`interval` must be positive")
    if cfg.get("otlp_timeout_ms", 5000) < 0:
        raise ValueError("`otlp.timeout` must be positive")


def jmx_gatherer_properties(endpoint: str, interval_ms: int,
                            otlp_endpoint: str, otlp_timeout_ms: int,
                            target_system: str = "",
                            groovy_script: str = "",
                            username: str = "",
                            password: str = "") -> str:
    """receiver.go:151-175 ``buildJMXMetricGathererConfig`` — exact
    field order and the target-system-over-groovy precedence."""
    url = jmx_service_url(endpoint)
    doc = (f"otel.jmx.service.url = {url}\n"
           f"otel.jmx.interval.milliseconds = {interval_ms}\n")
    if target_system:
        doc += f"otel.jmx.target.system = {target_system}\n"
    elif groovy_script:
        doc += f"otel.jmx.groovy.script = {groovy_script}\n"
    doc += (f"otel.exporter = otlp\n"
            f"otel.exporter.otlp.endpoint = {otlp_endpoint}\n"
            f"otel.exporter.otlp.metric.timeout = {otlp_timeout_ms}\n")
    if username:
        doc += f"otel.jmx.username = {username}\n"
    if password:
        doc += f"otel.jmx.password = {password}\n"
    return doc


def jmx_gatherer_properties_column(endpoint, interval_ms, otlp_endpoint,
                                   otlp_timeout_ms, target_system,
                                   groovy_script, username, password):
    """Catalyst twin of ``jmx_gatherer_properties`` for deriving a
    fleet of gatherer configs from a discovery table (all-codegen
    string assembly, no Python on the row path)."""
    url = jmx_service_url_column(endpoint)
    empty = F.lit("")
    script = (F.when(target_system != "",
                     F.concat(F.lit("otel.jmx.target.system = "),
                              target_system, F.lit("\n")))
              .when(groovy_script != "",
                    F.concat(F.lit("otel.jmx.groovy.script = "),
                             groovy_script, F.lit("\n")))
              .otherwise(empty))
    user = F.when(username != "",
                  F.concat(F.lit("otel.jmx.username = "), username,
                           F.lit("\n"))).otherwise(empty)
    pw = F.when(password != "",
                F.concat(F.lit("otel.jmx.password = "), password,
                         F.lit("\n"))).otherwise(empty)
    return F.concat(
        F.lit("otel.jmx.service.url = "), url, F.lit("\n"),
        F.lit("otel.jmx.interval.milliseconds = "),
        interval_ms.cast("string"), F.lit("\n"),
        script,
        F.lit("otel.exporter = otlp\n"),
        F.lit("otel.exporter.otlp.endpoint = "), otlp_endpoint,
        F.lit("\n"),
        F.lit("otel.exporter.otlp.metric.timeout = "),
        otlp_timeout_ms.cast("string"), F.lit("\n"),
        user, pw)


def jmx_subprocess_invocation(jar_path: str) -> list[str]:
    """receiver.go:69-73: executable + args (config arrives on stdin)."""
    return ["java", "-Dorg.slf4j.simpleLogger.defaultLogLevel=debug",
            "-jar", jar_path, "-config", "-"]
