"""Randomized parity for the round-2 final operators: one seeded batch
of adversarial cases through ONE Spark job each, checked against
independent twins (pandas merge_asof / pure Python).  Small key and
time ranges force the nasty regimes on purpose: timestamp ties,
multi-version dims, keys with no dim, duplicate lines within and
across documents, empty lines."""

import hashlib
import random

import pandas as pd

from opentelemetry_collector_contrib_spark.operators.asof import asof_join
from opentelemetry_collector_contrib_spark.datapipe.dedup import dedup_lines

from conftest import rows


def _asof_case(rng, n_keys=6, n_facts=80, n_dims=15):
    keys = [f"k{i}" for i in range(n_keys)]
    facts = [(rng.choice(keys), rng.randrange(0, 50), i)
             for i in range(n_facts)]
    dims, seen = [], set()
    for _ in range(n_dims):
        k, t = rng.choice(keys), rng.randrange(0, 50)
        if (k, t) not in seen:           # dim unique per (key, time)
            seen.add((k, t))
            dims.append((k, t, f"v{len(dims)}"))
    return facts, dims


def _merge_asof_twin(facts, dims, tolerance=None):
    f = (pd.DataFrame(facts, columns=["k", "t", "fid"])
         .sort_values("t", kind="stable").reset_index(drop=True))
    d = (pd.DataFrame(dims, columns=["k", "vt", "tier"])
         .sort_values("vt", kind="stable").reset_index(drop=True))
    kw = {"tolerance": tolerance} if tolerance is not None else {}
    m = pd.merge_asof(f, d, left_on="t", right_on="vt", by="k",
                      direction="backward", allow_exact_matches=True, **kw)
    return {r.fid: (None if pd.isna(r.vt) else int(r.vt),
                    None if pd.isna(r.tier) else r.tier)
            for r in m.itertuples()}


def test_asof_random_parity_with_merge_asof(spark):
    rng = random.Random(20260817)
    facts, dims = _asof_case(rng)
    f = spark.createDataFrame(facts, "k string, t long, fid long")
    d = spark.createDataFrame(dims, "k string, vt long, tier string")
    for tol in (None, 7):
        out = asof_join(f, d, on="k", fact_time="t", dim_time="vt",
                        dim_cols=["tier"], tolerance_ms=tol)
        got = {r[0]: (r[1], r[2])
               for r in rows(out, "fid", "_asof_time", "tier")}
        assert got == _merge_asof_twin(facts, dims, tolerance=tol), f"tol={tol}"


def _line_dedup_twin(docs):
    seen, out = set(), {}
    for did, text in sorted(docs):
        kept, nl = [], 0
        for ln in text.split("\n"):
            nl += 1
            if ln == "":
                kept.append(ln)
            elif ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[did] = (nl, len(kept), nl - len(kept),
                    hashlib.md5("\n".join(kept).encode()).hexdigest())
    return out


def test_dedup_lines_random_parity(spark):
    rng = random.Random(20260817)
    # tiny line alphabet -> heavy duplication; '' injects empties
    alphabet = ["a", "b", "c", "dd", "ee", ""]
    docs = [(i, "\n".join(rng.choice(alphabet)
                          for _ in range(rng.randrange(1, 8))))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r[0]: tuple(r[1:])
           for r in rows(dedup_lines(df), "id", "n_lines", "n_kept",
                         "n_dropped", "kept_md5")}
    assert got == _line_dedup_twin(docs)
