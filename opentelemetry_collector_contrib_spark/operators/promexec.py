"""prometheusexecreceiver semantics, batch/config form.

The reference wraps the core prometheus receiver around a managed
subprocess (``receiver/prometheusexecreceiver/receiver.go``).  The
deterministic semantics worth parity:

- custom-name extraction (``receiver.go:144-153`` ``extractName``):
  the job name is the part after the first "/" of the receiver's full
  name (``prometheus_exec/postgres`` -> ``postgres``); an absent or
  empty suffix falls back to the full first part.
- scrape-config derivation (``receiver.go:99-132``): http scheme,
  ``/metrics`` path, honor_labels=false, honor_timestamps=true, 10 s
  scrape timeout, one static target ``localhost:<port>``.
- port templating (``receiver.go:283-295`` ``fillPortPlaceholders``):
  every ``{{port}}`` occurrence in the command AND in each env value is
  replaced with the chosen port (the configured one, or a random free
  port when 0 — injected here for determinism).
- restart backoff (``receiver.go:307-316`` ``getDelay`` with constants
  at ``receiver.go:39-53``): healthy runs (elapsed > 30 min) or at most
  3 crashes -> 1 s; after that ``1s * 2^(crashCount-3+rand)`` with
  ``rand`` uniform in [0,1) (injected as a parameter here).
- crash counting (``receiver.go:271-279``): a healthy run resets the
  count to 1, anything else increments.

``fill_port_placeholders_column`` is the Catalyst twin for deriving a
fleet of subprocess commands from a config table — a narrow projection,
no shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

PORT_TEMPLATE = "{{port}}"
HEALTHY_PROCESS_TIME_S = 30 * 60
HEALTHY_CRASH_COUNT = 3
DELAY_MULTIPLIER = 2.0
INITIAL_DELAY_S = 1.0
DEFAULT_METRICS_PATH = "/metrics"
DEFAULT_SCRAPE_TIMEOUT_S = 10


def extract_name(receiver_name: str) -> str:
    """receiver.go:144-153."""
    parts = receiver_name.split("/", 1)
    if len(parts) > 1 and parts[1] != "":
        return parts[1]
    return parts[0]


def scrape_job(receiver_name: str, port: int,
               scrape_interval_s: int) -> dict:
    """receiver.go:99-132 ``getPromReceiverConfig``."""
    return {
        "job_name": extract_name(receiver_name),
        "scrape_interval_s": scrape_interval_s,
        "scrape_timeout_s": DEFAULT_SCRAPE_TIMEOUT_S,
        "scheme": "http",
        "metrics_path": DEFAULT_METRICS_PATH,
        "honor_labels": False,
        "honor_timestamps": True,
        "target": f"localhost:{port}",
    }


def fill_port_placeholders(command: str, env: list[tuple[str, str]],
                           port: int) -> tuple[str, list[tuple[str, str]]]:
    """receiver.go:283-295."""
    p = str(port)
    return (command.replace(PORT_TEMPLATE, p),
            [(k, v.replace(PORT_TEMPLATE, p)) for k, v in env])


def fill_port_placeholders_column(command, port):
    """Catalyst twin over a config table."""
    return F.replace(command, F.lit(PORT_TEMPLATE), port.cast("string"))


def extract_name_column(receiver_name):
    """Catalyst twin of ``extract_name``."""
    # SplitN(name, "/", 2): everything after the FIRST slash is the suffix
    suffix = F.regexp_extract(receiver_name, "^[^/]*/(.*)$", 1)
    has_slash = receiver_name.contains("/")
    first = F.substring_index(receiver_name, "/", 1)
    return (F.when(has_slash & (suffix != ""), suffix)
            .otherwise(first))


def compute_crash_count(elapsed_s: float, crash_count: int) -> int:
    """receiver.go:271-279."""
    if elapsed_s > HEALTHY_PROCESS_TIME_S:
        return 1
    return crash_count + 1


def get_delay(elapsed_s: float, crash_count: int,
              rand_u: float = 0.0) -> float:
    """receiver.go:307-316 (rand injected for determinism)."""
    if elapsed_s > HEALTHY_PROCESS_TIME_S or \
            crash_count <= HEALTHY_CRASH_COUNT:
        return INITIAL_DELAY_S
    return INITIAL_DELAY_S * math.pow(
        DELAY_MULTIPLIER, crash_count - HEALTHY_CRASH_COUNT + rand_u)
