"""awsemfexporter: datapoints -> CloudWatch EMF structured-log events.

Reference: exporter/awsemfexporter/metric_translator.go —
TranslateOtToCWMetric (:129-167, namespace resolution precedence:
config namespace > "service.namespace/service.name" > service.name >
service.namespace > "default"), buildCWMetric (:258-330, fields =
labels + OTelLib + metric value; dimension sets = full label set plus
rollups), dimensionRollup (:429-449: Zero rollup = [OTelLib] alone,
Single rollup = [OTelLib, k] per label key), TranslateCWMetricToEMF
(:170-204, the ``_aws.CloudWatchMetrics`` envelope; datapoints with no
measurements are dropped).

Batch shape: one JVM-side projection per datapoint row; the EMF event
is emitted both as a typed struct column (``emf``) and a JSON string
(``emf_json`` via to_json).  Layout note: Go marshals the flat fields
map with byte-sorted keys; here labels stay a map field inside the
struct — same information, Spark-native layout.  calculateRate for
cumulative sums (:451-466, a cross-batch prior-value cache) is the
delta/lag pattern shown in operators/sfx_translation.py and is left to
that operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ZERO_AND_SINGLE = "ZeroAndSingleDimensionRollup"
SINGLE_ONLY = "SingleDimensionRollupOnly"
NO_ROLLUP = "NoDimensionRollup"
OTEL_LIB_KEY = "OTelLib"
_NO_ILN = "Undefined"        # noInstrumentationLibraryName
DEFAULT_NAMESPACE = "default"


def resolve_namespace(config_namespace: str | None = None):
    """Column: namespace precedence (metric_translator.go:133-147)."""
    if config_namespace:
        return F.lit(config_namespace)
    svc = F.col("service_name")
    ns = F.col("service_namespace")
    both = svc.isNotNull() & ns.isNotNull()
    return (F.when(both, F.concat(ns, F.lit("/"), svc))
            .when(svc.isNotNull(), svc)
            .when(ns.isNotNull(), ns)
            .otherwise(F.lit(DEFAULT_NAMESPACE)))


def emf_events(df: DataFrame, namespace: str | None = None,
               rollup: str = ZERO_AND_SINGLE) -> DataFrame:
    """Datapoint rows -> EMF events.

    Expected columns: metric_name, unit, value_i/value_d, ts_ms,
    labels (map<string,string>), instrumentation_lib (nullable),
    service_name / service_namespace (nullable resource attrs).
    """
    if rollup not in (ZERO_AND_SINGLE, SINGLE_ONLY, NO_ROLLUP):
        raise ValueError(f"invalid rollup option: {rollup}")
    iln = F.coalesce(F.col("instrumentation_lib"), F.lit(_NO_ILN))
    has_iln = iln != _NO_ILN
    label_keys = F.array_sort(F.map_keys(F.col("labels")))
    dim_zero = F.when(has_iln, F.array(F.lit(OTEL_LIB_KEY))) \
                .otherwise(F.array().cast("array<string>"))

    # dimensionRollup (:429-449)
    rollups = F.array().cast("array<array<string>>")
    if rollup == ZERO_AND_SINGLE:
        rollups = F.when(F.size(label_keys) > 0, F.array(dim_zero)) \
                   .otherwise(rollups)
    if rollup in (ZERO_AND_SINGLE, SINGLE_ONLY):
        singles = F.transform(label_keys,
                              lambda k: F.concat(dim_zero, F.array(k)))
        rollups = F.concat(rollups, singles)

    # full dimension set = label keys (+ OTelLib), then the rollups;
    # single-label dedup edge case (:297-304): with exactly one label
    # and single-rollup active, the full set is skipped
    full_dims = F.concat(label_keys,
                         F.when(has_iln, F.array(F.lit(OTEL_LIB_KEY)))
                          .otherwise(F.array().cast("array<string>")))
    skip_full = (F.size(label_keys) <= 1) & F.lit(
        rollup in (ZERO_AND_SINGLE, SINGLE_ONLY)) & (F.size(rollups) > 0)
    dimensions = F.when(skip_full, rollups) \
                  .otherwise(F.concat(F.array(full_dims), rollups))

    measurement = F.struct(
        resolve_namespace(namespace).alias("Namespace"),
        dimensions.alias("Dimensions"),
        F.array(F.struct(F.col("metric_name").alias("Name"),
                         F.col("unit").alias("Unit"))).alias("Metrics"))
    # upsert (not map_concat): a pre-existing OTelLib label would hit
    # spark.sql.mapKeyDedupPolicy=EXCEPTION; the reference overwrites
    from ..operators.sfx_translation import _map_upsert
    labels_out = F.when(has_iln, _map_upsert(
        F.col("labels"), F.create_map(F.lit(OTEL_LIB_KEY), iln))) \
        .otherwise(F.col("labels"))
    emf = F.struct(
        labels_out.alias("fields"),
        F.col("metric_name").alias("metric"),
        F.coalesce(F.col("value_d"), F.col("value_i").cast("double"))
        .alias("value"),
        F.struct(F.array(measurement).alias("CloudWatchMetrics"),
                 F.col("ts_ms").alias("Timestamp")).alias("_aws"))
    out = df.select("*", emf.alias("emf"))
    return (out
            # no-measurement datapoints are dropped (:186-189)
            .where(F.size(F.col("emf._aws.CloudWatchMetrics")
                          [0]["Dimensions"]) > 0)
            .withColumn("emf_json", F.to_json(F.col("emf"))))
