#!/usr/bin/env python
"""Skew micro-bench: df-capped vs uncapped n-gram Jaccard pairing.

Synthesizes a corpus whose docs all share ONE boilerplate k-gram (the
web-corpus header/footer case): for N docs the uncapped shingle
self-join fans that single hot key out to N(N-1)/2 rows, while the
capped form drops it via a broadcast anti-join before pairing.  This
is the quadratic-hot-key shape that salting cannot fix (the pairs
really exist), so the honest scale answer is to not generate them.

Usage: python tools/bench_jaccard_cap.py [n_docs]
Prints one JSON line with wall seconds and output/join cardinalities.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402
from opentelemetry_collector_contrib_spark.datapipe.dedup import (  # noqa: E402
    ngram_jaccard_pairs, ngram_jaccard_pairs_capped)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    spark = get_spark(cpus=32)
    docs = (spark.range(n)
            .select(F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
                    F.concat(F.lit("shared boilerplate header unique"),
                             F.col("id"), F.lit(" tail"), F.col("id"),
                             F.lit(" end"), F.col("id")).alias("text"))
            .repartition(32)
            .persist())
    docs.count()

    t0 = time.time()
    n_uncapped = ngram_jaccard_pairs(docs, threshold=0.01).count()
    t_uncapped = time.time() - t0

    t0 = time.time()
    n_capped = ngram_jaccard_pairs_capped(docs, threshold=0.01,
                                          max_df=64).count()
    t_capped = time.time() - t0

    print(json.dumps({
        "n_docs": n,
        "hot_key_pairs": n * (n - 1) // 2,
        "uncapped_sec": round(t_uncapped, 2),
        "uncapped_pairs": n_uncapped,
        "capped_sec": round(t_capped, 2),
        "capped_pairs": n_capped,
        "speedup": round(t_uncapped / t_capped, 1),
    }))


if __name__ == "__main__":
    main()
