"""routingprocessor — attribute-value routing with default route.

Reference: processor/routingprocessor/routing.go:132-146 — look up the
value of one attribute in a routing table; a hit routes to that entry's
exporter list, a miss (value absent from table, or attribute missing/
empty) routes to ``default_exporters`` (config.go:22-52).  A value may
fan out to several exporters.

Spark-first re-expression (the north-star's OTTL-style predicate
fan-out): the routing table is a tiny plan-time constant, so the sink
list becomes ONE chained-CASE column (pure codegen — no join, no
shuffle) followed by either
- ``fanout()``: per-sink ``filter(array_contains(...))`` branches for
  per-sink writes (mirrors the reference's exporter lists), or
- ``explode(sinks)`` when a single (row, sink) stream is wanted for
  aggregation.

Scale notes: routing adds no shuffle; each sink branch re-reads the
same scan (Spark reuses the shuffle-free lineage) and its filter is
pushed into the scan where the routing attribute is a partition column.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class RoutingTable:
    """config.go:22-52: from_attribute + value->exporters table + defaults."""
    from_attribute: str
    table: dict[str, list[str]]
    default_sinks: list[str] = field(default_factory=list)

    def all_sinks(self) -> list[str]:
        out: list[str] = []
        for sinks in [*self.table.values(), self.default_sinks]:
            for s in sinks:
                if s not in out:
                    out.append(s)
        return out


# The fixture routing config (FIXTURES.md §3): three table entries, one
# default sink, `app-b`/`syslog` intentionally absent -> default route.
DEFAULT_ROUTES = RoutingTable(
    from_attribute="source",
    table={
        "hot-source": ["sumologic"],
        "app-a": ["sumologic", "loki"],
        "k8s": ["loki"],
    },
    default_sinks=["default-sink"],
)


def route_column(routes: RoutingTable) -> Column:
    """``sinks: array<string>`` routing column (chained CASE, codegen).

    Missing/empty attribute value -> default route (routing.go:134-137);
    value not in table -> default route (routing.go:139-142).
    """
    attr = F.col(routes.from_attribute)
    expr = None
    for value, sinks in routes.table.items():
        cond = attr == value
        arm = F.array(*[F.lit(s) for s in sinks])
        expr = F.when(cond, arm) if expr is None else expr.when(cond, arm)
    default = F.array(*[F.lit(s) for s in routes.default_sinks])
    return expr.otherwise(default) if expr is not None else default


def with_route(df: DataFrame, routes: RoutingTable) -> DataFrame:
    return df.withColumn("sinks", route_column(routes))


def fanout(df: DataFrame, routes: RoutingTable) -> dict[str, DataFrame]:
    """Per-sink branches (the pushDataToExporters fan-out,
    routing.go:152-161).  A row routed to k sinks appears in k branches."""
    routed = with_route(df, routes)
    return {s: routed.filter(F.array_contains(F.col("sinks"), s)).drop("sinks")
            for s in routes.all_sinks()}


def exploded(df: DataFrame, routes: RoutingTable) -> DataFrame:
    """(row, sink) stream — one output row per (input row, routed sink)."""
    return (with_route(df, routes)
            .withColumn("sink", F.explode("sinks"))
            .drop("sinks"))
