"""LSH-blocked embedding near-dup — blocked == brute on planted dups.

Round-2 verdict item 3: ``embedding_neardup_pairs`` is all-pairs
(O(N²)); the production path must block by LSH bucket.  These tests
pin (a) exact agreement with brute force on a corpus of planted
exact-direction duplicates, (b) blocked ⊆ brute always, and (c) the
plan contains no unbucketed cartesian self-join.
"""

import hashlib

from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.dedup import (
    embedding_neardup_blocked, embedding_neardup_pairs)

DIM = 16


def _vec(seed: str, scale: float = 1.0) -> list[float]:
    """Deterministic pseudo-random unit-ish vector from a seed."""
    out = []
    for d in range(DIM):
        h = int(hashlib.md5(f"{seed}:{d}".encode()).hexdigest()[:8], 16)
        out.append(scale * ((h % 2001 - 1000) / 1000.0))
    return out


def _corpus(spark):
    rows = []
    for i in range(24):
        rows.append((i, _vec(f"base-{i}")))
    # planted duplicates: exact-direction copies (rescaled) of base-0..3
    # — cosine exactly 1.0, identical LSH signs by construction
    for j in range(4):
        rows.append((100 + j, _vec(f"base-{j}", scale=2.5)))
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_blocked_equals_brute_on_planted_dups(spark):
    df = _corpus(spark)
    brute = {(r.id_a, r.id_b) for r in
             embedding_neardup_pairs(df, threshold=0.95,
                                     id_col="vec_id").collect()}
    blocked = {(r.id_a, r.id_b) for r in
               embedding_neardup_blocked(df, dim=DIM, threshold=0.95,
                                         id_col="vec_id").collect()}
    assert brute == {(0, 100), (1, 101), (2, 102), (3, 103)}
    assert blocked == brute


def test_blocked_subset_of_brute_at_loose_threshold(spark):
    """At a loose threshold the bucketing may (by design) miss
    wide-angle pairs, but must never invent one, and every pair it
    emits carries the identical rounded cosine."""
    df = _corpus(spark)
    brute = {(r.id_a, r.id_b): r.cosine for r in
             embedding_neardup_pairs(df, threshold=0.3,
                                     id_col="vec_id").collect()}
    blocked = {(r.id_a, r.id_b): r.cosine for r in
               embedding_neardup_blocked(df, dim=DIM, threshold=0.3,
                                         id_col="vec_id").collect()}
    assert set(blocked) <= set(brute)
    assert all(brute[k] == v for k, v in blocked.items())
    # the planted exact-direction dups are always recalled
    assert {(0, 100), (1, 101), (2, 102), (3, 103)} <= set(blocked)


def test_blocked_plan_has_no_cartesian(spark):
    df = _corpus(spark)
    plan = (embedding_neardup_blocked(df, dim=DIM, id_col="vec_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # candidate generation is an equi-join on (table, bucket)
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan \
        or "BroadcastHashJoin" in plan
