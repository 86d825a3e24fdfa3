"""dynatraceexporter analog — datapoints → Dynatrace metric-ingest lines.

Reference: ``exporter/dynatraceexporter`` —

- ``NormalizeString`` (serialization/serialization.go:153-171): replace
  every ``[^A-Za-z0-9.-]+`` run with ``_``, strip LEADING chars from
  the set ``._0123456789``, truncate to the max length, strip trailing
  ``_``; empty result = error (the metric/label is dropped);
- ``normalizeMetricName`` (metrics_exporter.go:198-216): metric names
  get max length 250 minus ``len(prefix)+1`` when a prefix is
  configured, then ``prefix + "." + name``; normalization failure
  drops the whole metric (metrics_exporter.go:96-101);
- ``serializeTags`` (serialization.go:123-146): per label,
  ``NormalizeString(lower(key), 100)`` (errors skip the label) and the
  value quoted via ``escapeDimension``; exporter-config tags are
  prepended verbatim;
- ``escapeDimension`` (serialization.go:148-151): faithfully mirrors
  the reference's escape ORDER — ``"`` → ``\\"`` first, then ``\\`` →
  ``\\\\`` — so a literal ``"`` serializes as ``\\\\"`` (the
  just-inserted backslash is doubled by the second pass).  That is the
  reference's observable behavior, bug-for-bug;
- ``serializeFloat64`` (serialization.go:173-180): ``%.6f`` then
  trim TRAILING chars in the set ``{0, .}``; all-trimmed → ``"0"``.
  Mirrored including the quirk that ``100.000000`` trims to ``"1"``
  (Go ``strings.TrimRight`` treats the cutset as a char set);
- gauge lines ``name[,tags] value ts_ms`` (serialization.go:35-62,
  108-121; ts = UnixNano / 1e6);
- histogram lines ``name[,tags] gauge,min=A,max=A,sum=S,count=C ts_ms``
  with min=max=avg (serialization.go:64-106); a zero-count datapoint
  aborts serialization of the WHOLE metric slice with ``return ""``
  (serialization.go:71-73, 94-96) — mirrored as a group-level drop of
  every datapoint sharing the metric name.

Batch shape: everything is pure Catalyst string expressions (one
projection, no Python), with the label map sorted by key so the tag
line is deterministic (pdata's ForEach order is insertion order; a map
column has none, so sorted-by-key is the canonical choice here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

MAX_METRIC_KEY_LEN = 250   # metrics_exporter.go:57
MAX_DIM_KEY_LEN = 100      # serialization.go:31

GAUGE_TYPES = ("gauge_int", "gauge_double", "sum_int", "sum_double")
HIST_TYPES = ("hist_int", "hist_double")


def normalize_string(col, max_len: int):
    """``NormalizeString`` — NULL when the result is empty (= the Go
    error path)."""
    s = F.regexp_replace(col, "[^A-Za-z0-9.-]+", "_")
    s = F.regexp_replace(s, "^[._0-9]+", "")        # TrimLeft "._0123456789"
    s = F.substring(s, 1, max_len)
    s = F.regexp_replace(s, "_+$", "")              # trailing underscores
    return F.when(F.length(s) > 0, s)


def escape_dimension(col):
    """``escapeDimension`` — reference order: quotes first, then
    backslashes (so an input quote becomes backslash-backslash-quote)."""
    s = F.replace(col, F.lit('"'), F.lit('\\"'))
    s = F.replace(s, F.lit("\\"), F.lit("\\\\"))
    return F.concat(F.lit('"'), s, F.lit('"'))


def serialize_float(col):
    """``serializeFloat64`` — %.6f, trim trailing [0.] set, '' → '0'."""
    s = F.format_string("%.6f", col)
    s = F.regexp_replace(s, "[0.]+$", "")
    return F.when(F.length(s) > 0, s).otherwise(F.lit("0"))


def _tagline(tags: tuple[str, ...]):
    """Config tags verbatim + normalized/escaped labels sorted by key
    (serializeTags, serialization.go:123-146)."""
    entries = F.array_sort(F.map_entries(F.col("labels")))
    label_tags = F.filter(
        F.transform(
            entries,
            lambda e: F.when(
                normalize_string(F.lower(e["key"]),
                                 MAX_DIM_KEY_LEN).isNotNull(),
                F.concat(normalize_string(F.lower(e["key"]), MAX_DIM_KEY_LEN),
                         F.lit("="), escape_dimension(e["value"])))),
        lambda t: t.isNotNull())
    cfg = F.array(*[F.lit(t) for t in tags]) if tags else \
        F.expr("cast(array() as array<string>)")
    return F.array_join(F.concat(cfg, label_tags), ",")


def dynatrace_lines(df: DataFrame, prefix: str = "",
                    tags: tuple[str, ...] = ()) -> DataFrame:
    """Datapoint rows → one Dynatrace line-protocol row each.

    Input columns: ``name``, ``dtype`` (gauge_int | gauge_double |
    sum_int | sum_double | hist_int | hist_double), ``value_i`` bigint,
    ``value_d`` double, ``hist_sum`` double, ``hist_sum_i`` bigint,
    ``hist_count`` bigint, ``ts_ns`` bigint, ``labels``
    map<string,string>.  Output: (name, line) — metrics whose name
    fails normalization are dropped (metrics_exporter.go:96-101), and
    histogram metrics with ANY zero-count datapoint drop every
    datapoint of that name (the reference's slice-level ``return ""``).
    """
    name_budget = MAX_METRIC_KEY_LEN - (len(prefix) + 1 if prefix else 0)
    norm = normalize_string(F.col("name"), name_budget)
    full_name = (F.concat(F.lit(prefix + "."), norm) if prefix else norm)

    is_hist = F.col("dtype").isin(*HIST_TYPES)
    # slice-level early return (serialization.go:71-73,94-96): any
    # zero-count histogram point kills the whole metric name
    poisoned = F.max(F.when(is_hist & (F.col("hist_count") == 0), 1)
                     .otherwise(0)).over(Window.partitionBy("name"))

    avg = F.try_divide(
        F.when(F.col("dtype") == "hist_int",
               F.col("hist_sum_i").cast("double"))
        .otherwise(F.col("hist_sum")), F.col("hist_count"))
    hist_sum_s = (F.when(F.col("dtype") == "hist_int",
                         F.col("hist_sum_i").cast("string"))
                  .otherwise(serialize_float(F.col("hist_sum"))))
    valueline = (
        F.when(F.col("dtype").isin("gauge_int", "sum_int"),
               F.col("value_i").cast("string"))
        .when(F.col("dtype").isin("gauge_double", "sum_double"),
              serialize_float(F.col("value_d")))
        .otherwise(F.concat(
            F.lit("gauge,min="), serialize_float(avg),
            F.lit(",max="), serialize_float(avg),
            F.lit(",sum="), hist_sum_s,
            F.lit(",count="), F.col("hist_count").cast("string"))))

    tagline = _tagline(tags)
    head = F.when(tagline == "", full_name) \
        .otherwise(F.concat(full_name, F.lit(","), tagline))
    line = F.concat(head, F.lit(" "), valueline, F.lit(" "),
                    F.floor(F.col("ts_ns") / F.lit(1_000_000))
                    .cast("bigint").cast("string"))

    return (df
            .withColumn("_poisoned", poisoned)
            .filter((F.col("_poisoned") == 0) & norm.isNotNull())
            .select(full_name.alias("name"), line.alias("line")))
