#!/usr/bin/env python
"""Skew micro-bench: star-edge vs all-pairs LSH candidate generation.

Synthesizes a boilerplate-heavy corpus — C template clusters of D
near-identical docs each (same page modulo a tiny unique suffix, the
shape that survives exact dedup on a real web crawl).  Docs in a
cluster share every MinHash band, so each (band, sig) bucket holds D
docs: the all-pairs generator emits C * BANDS * D(D-1)/2 candidate
rows before dedup, the star generator C * D-ish hub edges.  This is
the last quadratic hot spot on the 100-TB dedup path (VERDICT r03
item 1); like the shingle-df case, salting cannot fix it because the
pairs really exist — the honest scale answer is to not generate them
and let connected components restore transitivity.

Usage: python tools/bench_lsh_star.py [n_clusters] [docs_per_cluster]
Prints one JSON line with wall seconds and candidate cardinalities.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from opentelemetry_collector_contrib_spark.session import get_spark  # noqa: E402
from opentelemetry_collector_contrib_spark.datapipe.dedup import (  # noqa: E402
    lsh_candidate_edges_star, lsh_candidate_pairs, minhash_signatures)


def main() -> None:
    clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 3000
    spark = get_spark(cpus=32)
    docs = (spark.range(clusters * per)
            .select(F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
                    F.concat(
                        F.lit("template cluster "),
                        (F.col("id") % clusters).cast("string"),
                        F.lit(" breaking news shared header body text "
                              "repeated across every page of the site "
                              "footer copyright navigation v"),
                        F.col("id").cast("string")).alias("text"))
            .repartition(32))
    sig = minhash_signatures(docs, k=3).persist()
    sig.count()

    t0 = time.time()
    n_star = lsh_candidate_edges_star(sig).count()
    t_star = time.time() - t0

    t0 = time.time()
    n_all = lsh_candidate_pairs(sig).count()
    t_all = time.time() - t0

    print(json.dumps({
        "clusters": clusters,
        "docs_per_cluster": per,
        "star_sec": round(t_star, 2),
        "star_candidates": n_star,
        "all_pairs_sec": round(t_all, 2),
        "all_pairs_candidates": n_all,
        "speedup": round(t_all / t_star, 1),
        "candidate_ratio": round(n_all / max(n_star, 1), 1),
    }))


if __name__ == "__main__":
    main()
