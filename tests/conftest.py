"""Shared Spark session + synthetic-data fixtures.

One local[8] session for the whole run (JVM startup dominates
otherwise); small-literal DataFrames per test, mirroring the
reference's table-driven unit style (SURVEY §5)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from opentelemetry_collector_contrib_spark import datagen
from opentelemetry_collector_contrib_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=8,
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    """Deterministic synthetic tables at the smallest scale."""
    return datagen.ensure_sf(0.001)


def rows(df, *cols):
    """Sorted list-of-tuples for order-insensitive golden compares
    (the require.ElementsMatch analog, e2e_test.go:197)."""
    if cols:
        df = df.select(*cols)
    return sorted([tuple(r) for r in df.collect()],
                  key=lambda t: tuple((v is None, str(v)) for v in t))
