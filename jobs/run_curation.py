#!/usr/bin/env python
"""spark-submit entry point: end-to-end training-corpus curation.

    spark-submit --py-files otelcol_spark.zip jobs/run_curation.py \
        --docs /path/documents.parquet --out /path/curated \
        [--jaccard 0.5] [--val-permille 100]

Runs the composed cascade (datapipe/curation.py::curation_pipeline):
Gopher quality gate -> exact-dup survivors -> MinHash-LSH fuzzy dedup
with transitive (connected-component) survivors -> PII scrub ->
deterministic train/val split, writing parquet partitioned by split.
The stage funnel is printed as one JSON line; every count is an
Observation aggregate riding the single write action — no extra scans.

``--tokens-native`` switches to the tokens cascade
(datapipe/token_curation.py): the same flow computed straight from the
``tokens: array<int32>`` column with zero detokenize — token-quality
gate, digest-keyed exact dedup, tokens MinHash-LSH + connected
components, duplicated-span removal, split.  ``--docs`` then points at
a tokens-shaped table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True, help="documents parquet path")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--val-permille", type=int, default=100)
    ap.add_argument("--quality", default="gopher",
                    choices=["gopher", "score", "none"])
    ap.add_argument("--min-quality", type=float, default=0.0)
    ap.add_argument("--run-dir", default=None,
                    help="stage-checkpoint directory: each cascade stage "
                         "materializes here and a rerun with the same "
                         "--run-dir resumes from the last completed stage "
                         "(curated output lands in <run-dir>/curated; "
                         "--out is ignored)")
    ap.add_argument("--tokens-native", action="store_true",
                    help="run the tokens cascade (token_curation.py) over "
                         "a tokens-shaped table — no detokenize anywhere")
    ap.add_argument("--minhash-threshold", type=float, default=0.4,
                    help="tokens-native: Jaccard threshold over token "
                         "4-grams")
    ap.add_argument("--span-n", type=int, default=13,
                    help="tokens-native: duplicated-span removal gram size "
                         "(0 disables removal)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    if spark is None:
        from opentelemetry_collector_contrib_spark.session import get_spark
        spark = get_spark(app_name="otelcol-curation")

    if args.tokens_native:
        if args.run_dir:
            raise SystemExit("--run-dir staging is the text cascade's; "
                             "tokens-native runs are one DAG (rerun-safe "
                             "by determinism)")
        from opentelemetry_collector_contrib_spark.datapipe.token_curation \
            import tokens_curation_pipeline
        toks = spark.read.parquet(args.docs)
        out, obs = tokens_curation_pipeline(
            toks, minhash_threshold=args.minhash_threshold,
            span_n=args.span_n or 13, remove_spans=args.span_n > 0,
            val_permille=args.val_permille)
        (out.write.mode("overwrite").partitionBy("split")
         .parquet(args.out))
        funnel = {stage: int(o.get["n"]) for stage, o in obs.items()}
        print(json.dumps({"status": "complete", "out": args.out,
                          "mode": "tokens-native", "funnel": funnel}))
        return

    docs = spark.read.parquet(args.docs).select("doc_id", "text")
    if args.run_dir:
        from opentelemetry_collector_contrib_spark.datapipe.curation import (
            curation_pipeline_staged)
        funnel = curation_pipeline_staged(
            docs, args.run_dir, jaccard_threshold=args.jaccard,
            val_permille=args.val_permille, quality=args.quality,
            min_quality=args.min_quality)
        print(json.dumps({"status": "complete",
                          "out": f"{args.run_dir}/curated",
                          "funnel": funnel}))
        return
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        curation_pipeline)
    out, obs = curation_pipeline(docs, jaccard_threshold=args.jaccard,
                                 val_permille=args.val_permille,
                                 quality=args.quality,
                                 min_quality=args.min_quality)
    (out.write.mode("overwrite").partitionBy("split").parquet(args.out))
    funnel = {stage: int(o.get["n"]) for stage, o in obs.items()}
    print(json.dumps({"status": "complete", "out": args.out,
                      "funnel": funnel}))


if __name__ == "__main__":
    main()
