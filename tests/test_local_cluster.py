"""Process-isolated execution: the e2e pipeline and the tokens
curation cascade on a ``local-cluster[2,4,*]`` master — real Worker
JVMs with separate executor processes, exercising closure/broadcast
serialization, shuffle over the block transfer service, and python
worker module resolution through the spark-submit ``--py-files`` zip
(tools/package.py) — none of which ``local[n]``'s single JVM covers.

The subprocess prints result digests; the test recomputes the same
queries on the in-process ``local[8]`` session and asserts equality:
process isolation must not change a single row.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, sys, tempfile
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tools")
from opentelemetry_collector_contrib_spark import datagen
from opentelemetry_collector_contrib_spark.plans.pipeline import (
    PipelineConfig, run_pipeline)
from opentelemetry_collector_contrib_spark.datapipe.dedup import hash_sample
from opentelemetry_collector_contrib_spark.datapipe.token_curation import (
    tokens_curation_pipeline)
import package as pkgtool

d = datagen.ensure_sf(0.001)
zip_path = pkgtool.main()

from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder
         .master("local-cluster[2,4,3072]")
         .appName("lc-isolation-test")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
# the spark-submit --py-files path: executors resolve the package from
# the shipped archive, not the repo checkout
spark.sparkContext.addPyFile(zip_path)

work = tempfile.mkdtemp(prefix="lc_iso_")
cfg = PipelineConfig(tokens_path=f"{d}/tokens.parquet",
                     pods_path=f"{d}/pods.parquet",
                     out_dir=f"{work}/out", n_units=2,
                     fanout_strategy="staged")
run_pipeline(spark, cfg)
sev = sorted(map(list, spark.read.parquet(f"{work}/out/sinks/sumologic")
                 .groupBy("severity_text")
                 .agg(F.count(F.lit(1)).alias("n"),
                      F.sum("n_tok").alias("sum_tok")).collect()))

toks = hash_sample(spark.read.parquet(f"{d}/tokens.parquet"), 0.2,
                   salt="tokmh")
out, _ = tokens_curation_pipeline(toks, minhash_threshold=0.4,
                                  k_gram=4, span_n=13)
cur = sorted(map(list, out.select("doc_id", "n_removed",
                                  F.size("tokens").alias("n_tok"),
                                  "split").collect()))
print("RESULT:" + json.dumps({"sev": sev, "cur": cur}))
spark.stop()
"""


@pytest.fixture(scope="module")
def lc_result():
    script = _SCRIPT % {"repo": REPO}
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=560,
                          cwd=REPO)
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith("RESULT:")]
    assert lines, (f"local-cluster run produced no result\n"
                   f"stdout tail: {proc.stdout[-2000:]}\n"
                   f"stderr tail: {proc.stderr[-2000:]}")
    return json.loads(lines[0][len("RESULT:"):])


def test_pipeline_on_local_cluster_matches_local(spark, sf_dir,
                                                 lc_result, tmp_path):
    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.plans.pipeline import (
        PipelineConfig, run_pipeline)
    cfg = PipelineConfig(tokens_path=f"{sf_dir}/tokens.parquet",
                         pods_path=f"{sf_dir}/pods.parquet",
                         out_dir=str(tmp_path / "out"), n_units=2,
                         fanout_strategy="staged")
    run_pipeline(spark, cfg)
    want = sorted(map(list,
                      spark.read.parquet(str(tmp_path / "out/sinks/"
                                             "sumologic"))
                      .groupBy("severity_text")
                      .agg(F.count(F.lit(1)).alias("n"),
                           F.sum("n_tok").alias("sum_tok")).collect()))
    assert lc_result["sev"] == want


def test_cascade_on_local_cluster_matches_local(spark, sf_dir,
                                                lc_result):
    from pyspark.sql import functions as F
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        hash_sample)
    from opentelemetry_collector_contrib_spark.datapipe.token_curation \
        import tokens_curation_pipeline
    toks = hash_sample(
        spark.read.parquet(f"{sf_dir}/tokens.parquet"), 0.2,
        salt="tokmh")
    out, _ = tokens_curation_pipeline(toks, minhash_threshold=0.4,
                                      k_gram=4, span_n=13)
    want = sorted(map(list,
                      out.select("doc_id", "n_removed",
                                 F.size("tokens").alias("n_tok"),
                                 "split").collect()))
    assert lc_result["cur"] == want
