from .regex_parser import RegexParser, DEFAULT_LOG_PATTERN
from .json_parser import json_parser
from .enrich import broadcast_enrich, prepare_pods_dim
from .resource_detection import resource_detection
from .routing import RoutingTable, route_column, fanout
from .groupbyattrs import group_by_attrs, group_by_attrs_metrics
from .asof import asof_join
from .sessionize import sessionize
from .grok import grok_parser, grok_to_regex

__all__ = [
    "RegexParser", "DEFAULT_LOG_PATTERN", "json_parser",
    "broadcast_enrich", "prepare_pods_dim", "resource_detection",
    "RoutingTable", "route_column", "fanout",
    "group_by_attrs", "group_by_attrs_metrics",
    "asof_join", "sessionize", "grok_parser", "grok_to_regex",
]
