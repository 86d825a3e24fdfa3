"""resourcedetection — merge detected environment attributes into every row.

Reference: processor/resourcedetectionprocessor/resourcedetection_processor.go:33-67
detects a resource once at startup and merges it into every batch; merge
mode is Insert (keep existing) or Upsert (override)
(internal/resourcedetection.go:176-189).

In Spark this is a degenerate broadcast join with a 1-row dimension —
i.e. plain ``lit()`` columns + ``coalesce`` direction.  Pure codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resource_detection(df: DataFrame, detected: dict[str, str],
                       override: bool = False) -> DataFrame:
    """Merge constant detected attributes into the frame.

    override=False -> Insert (existing wins, resourcedetection.go:176-183)
    override=True  -> Upsert (detected wins,  resourcedetection.go:184-189)
    """
    for k, v in detected.items():
        lit = F.lit(v)
        if k in df.columns:
            col = lit if override else F.coalesce(F.col(k), lit)
        else:
            col = lit
        df = df.withColumn(k, col)
    return df
