"""Sequence packing + decontamination (datapipe/curation.py)."""

import pytest

from opentelemetry_collector_contrib_spark.datapipe.curation import (
    contamination, pack_chunks,
)


def test_pack_chunks_concat_and_split(spark):
    # single group so the packing order is just doc_id order
    df = spark.createDataFrame(
        [("a", 1000), ("b", 1000), ("c", 100), ("d", 0), ("e", 2048)],
        "doc_id string, n_tok long")
    out = {r.doc_id: r for r in
           pack_chunks(df, budget=2048, n_groups=1).collect()}
    # a: [0,1000) -> chunk 0 ; b: [1000,2000) -> chunk 0
    assert (out["a"].first_chunk, out["a"].last_chunk) == (0, 0)
    assert out["a"].chunk_offset == 0
    assert (out["b"].first_chunk, out["b"].last_chunk) == (0, 0)
    assert out["b"].chunk_offset == 1000
    # c: [2000,2100) straddles the 2048 boundary -> chunks 0..1
    assert (out["c"].first_chunk, out["c"].last_chunk) == (0, 1)
    # d: zero-length at 2100 -> chunk 1, takes no space
    assert (out["d"].first_chunk, out["d"].last_chunk) == (1, 1)
    assert out["d"].chunk_offset == 2100 - 2048
    # e: [2100,4148) -> chunks 1..2
    assert (out["e"].first_chunk, out["e"].last_chunk) == (1, 2)


def test_pack_chunks_groups_are_independent(spark):
    rows = [(f"d{i:03d}", 700) for i in range(64)]
    df = spark.createDataFrame(rows, "doc_id string, n_tok long")
    out = pack_chunks(df, budget=2048, n_groups=4).collect()
    assert {r.grp for r in out} <= set(range(4))
    # within each group the cumulative layout is gap-free: sum of
    # lengths equals max chunk end offset
    from collections import defaultdict
    by_grp = defaultdict(list)
    for r in out:
        by_grp[r.grp].append(r)
    for grp, docs in by_grp.items():
        total = sum(d.n_tok for d in docs)
        last = max(docs, key=lambda d: (d.first_chunk, d.chunk_offset))
        assert last.first_chunk * 2048 + last.chunk_offset + last.n_tok \
            in (total, total + 2048 * 0)  # layout is contiguous


def test_pack_chunks_rejects_bad_budget(spark):
    df = spark.createDataFrame([("a", 1)], "doc_id string, n_tok long")
    with pytest.raises(ValueError):
        pack_chunks(df, budget=0)


def test_auto_pack_groups_scales_with_input():
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        auto_pack_groups)
    # small inputs floor at the cluster parallelism
    assert auto_pack_groups(1 << 20, 32) == 32
    assert auto_pack_groups(0, 8) == 8
    # past the floor the count tracks bytes / 256 MB
    assert auto_pack_groups(100 << 30, 32) == 400          # 100 GB
    assert auto_pack_groups(100 << 40, 32) == 409600       # 100 TB
    # runaway cap
    assert auto_pack_groups(1 << 60, 32) == 1 << 20


def test_pack_groups_auto_resolution(spark, tmp_path):
    """n_groups="auto" (the default) sizes from plan statistics: a tiny
    parquet scan resolves to the parallelism floor, and the resolved
    grouping is identical to passing the same count explicitly."""
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        _resolve_groups, auto_pack_groups, pack_tokens)
    rows = [(f"d{i:03d}", list(range(i % 7 + 1))) for i in range(200)]
    p = str(tmp_path / "toks.parquet")
    spark.createDataFrame(rows, "doc_id string, tokens array<int>") \
        .write.parquet(p)
    df = spark.read.parquet(p)
    par = spark.sparkContext.defaultParallelism
    n = _resolve_groups(df, "auto")
    assert n == auto_pack_groups(
        int(df._jdf.queryExecution().optimizedPlan().stats()
            .sizeInBytes()), par)
    assert n >= par
    auto_rows = sorted(map(tuple, pack_tokens(df, budget=16).collect()))
    expl_rows = sorted(map(tuple,
                           pack_tokens(df, budget=16,
                                       n_groups=n).collect()))
    assert auto_rows == expl_rows


def test_contamination_overlap_counts(spark):
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated content lives here today"),
         (3, "tiny"),                                 # < k words
         (4, "quick brown fox appears again quick brown fox")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps around")], "doc_id long, text string")
    out = {r.id: r for r in contamination(train, bench, k=3).collect()}
    # doc 1 shares 'quick brown fox' and 'brown fox jumps'
    assert out[1].n_overlap == 2 and out[1].contaminated
    assert out[2].n_overlap == 0 and not out[2].contaminated
    assert out[3].n_shingles == 0 and not out[3].contaminated
    # doc 4 shares only 'quick brown fox' (distinct shingles)
    assert out[4].n_overlap == 1
    assert out[1].n_shingles == 7


def test_rarity_scores(spark):
    from opentelemetry_collector_contrib_spark.datapipe.lm_score import (
        rarity_scores, unigram_counts)
    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"),
         (2, "the dog sat"),
         (3, "zyzzyva"),
         (4, "")],
        "doc_id long, text string")
    freq = {r.word: r.n for r in unigram_counts(docs).collect()}
    assert freq["the"] == 3 and freq["sat"] == 2 and freq["zyzzyva"] == 1
    out = {r.id: r for r in rarity_scores(docs, rare_max_count=1).collect()}
    # doc 1: words the,cat,sat,on,the,mat -> rare(=count 1): cat,on,mat
    assert out[1].n_words == 6 and out[1].n_rare == 3
    assert out[1].rare_frac == 3 / 6
    assert out[1].min_count == 1 and out[1].sum_count == 3 + 1 + 2 + 1 + 3 + 1
    # doc 3: single hapax -> fully rare
    assert out[3].rare_frac == 1.0
    # empty doc kept with zero stats
    assert out[4].n_words == 0 and out[4].rare_frac == 0.0
    assert out[4].min_count is None


def test_domain_extraction_and_blocklist(spark):
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        domain_blocklist_filter, extract_domains)
    docs = spark.createDataFrame(
        [(1, "see https://Spam.Example.COM/x and http://a.b.good.org/y"),
         (2, "no urls at all"),
         (3, "http://localhost/z and https://example.com/q")],
        "doc_id long, text string")
    d = {r.id: r for r in extract_domains(docs).collect()}
    assert set(d[1].hosts) == {"spam.example.com", "a.b.good.org"}
    assert set(d[1].domains) == {"example.com", "good.org"}
    assert d[2].domains == []
    assert "localhost" in d[3].domains          # single-label kept as is
    bl = spark.createDataFrame([("EXAMPLE.com",)], "domain string")
    out = {r.id: r for r in domain_blocklist_filter(docs, bl).collect()}
    assert out[1].blocked and out[1].n_blocked == 1 and out[1].n_domains == 2
    assert not out[2].blocked and out[2].n_domains == 0
    assert out[3].blocked                        # example.com matched
    # sentence punctuation after a URL must not mangle the domain
    docs2 = spark.createDataFrame(
        [(9, "watch https://evil.example.com. Next sentence, and"
             " https://a.com...see")],
        "doc_id long, text string")
    d2 = extract_domains(docs2).collect()[0]
    assert set(d2.domains) == {"example.com", "a.com"}
    out2 = domain_blocklist_filter(docs2, bl).collect()[0]
    assert out2.blocked


def test_canonical_url_rules(spark):
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        url_dedup_keys)
    cases = [
        # case soup + default port + fragment collapse
        ("HTTP://Example.COM:80/Path#frag", "http://example.com/Path"),
        ("https://EXAMPLE.com:443/", "https://example.com/"),
        # non-default port kept
        ("http://a.com:8080/x", "http://a.com:8080/x"),
        # empty path -> '/'
        ("https://a.com", "https://a.com/"),
        # tracking params dropped, rest sorted, '?' dropped when empty
        ("http://a.com/p?utm_source=t&b=2&a=1&gclid=g",
         "http://a.com/p?a=1&b=2"),
        ("http://a.com/p?fbclid=x", "http://a.com/p"),
        # utm-prefixed value names only (utmx is NOT tracking)
        ("http://a.com/p?utmx=1", "http://a.com/p?utmx=1"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "doc_id long, url string")
    got = {r["doc_id"]: r["canon"]
           for r in url_dedup_keys(df).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_canonical_url_collapses_crawl_variants(spark):
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        url_dedup_keys)
    from pyspark.sql import functions as F
    variants = ["http://WWW.a.com/p?b=2&a=1",
                "HTTP://www.A.COM:80/p?a=1&b=2&utm_source=rss",
                "http://www.a.com/p?a=1&b=2#section"]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)],
                               "doc_id long, url string")
    n = (url_dedup_keys(df).select("canon").distinct().count())
    assert n == 1


def test_length_grouped_batches_fill(spark):
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        length_grouped_batches)
    rows = ([(f"a{i:02d}", 10) for i in range(70)]     # 70 docs of len 10
            + [(f"b{i:02d}", 25) for i in range(32)])  # exactly one batch
    df = spark.createDataFrame(rows, "doc_id string, n_tok int")
    got = {(r["n_tok"], r["batch_idx"]): (r["n_docs"], r["fill_frac"])
           for r in length_grouped_batches(df, batch_size=32).collect()}
    assert got[(10, 0)] == (32, 1.0) and got[(10, 1)] == (32, 1.0)
    assert got[(10, 2)] == (6, round(6 / 32, 6))       # remainder
    assert got[(25, 0)] == (32, 1.0)
    assert len(got) == 4
    # full batches pad zero tokens by construction (single length each)


def test_temperature_fractions_flatten_and_preserve_size():
    import math

    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        temperature_fractions)
    counts = {"hot": 8000, "mid": 1500, "tail": 500}
    f = temperature_fractions(counts, temperature=0.5)
    # hot downsampled, tail upsampled
    assert f["hot"] < 1.0 < f["tail"]
    # expected resampled size == original corpus size
    n = sum(counts.values())
    assert math.isclose(sum(f[s] * counts[s] for s in counts), n,
                        rel_tol=1e-12)
    # T=1 is the identity mix (up to float roundoff)
    f1 = temperature_fractions(counts, temperature=1.0)
    assert all(math.isclose(v, 1.0, rel_tol=1e-12) for v in f1.values())
    # lower temperature flattens harder
    f2 = temperature_fractions(counts, temperature=0.25)
    assert f2["tail"] > f["tail"] and f2["hot"] < f["hot"]


def test_pack_tokens_materializes_windows(spark):
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        pack_tokens)
    rows = [("d0", list(range(0, 6))),      # 6 tokens
            ("d1", list(range(10, 17))),    # 7 tokens, crosses chunk edge
            ("d2", []),                     # zero-length: no span
            ("d2b", None),                  # NULL array: no span, no
                                            # offset shift (size=-1 trap)
            ("d3", list(range(20, 23)))]    # 3 tokens
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = pack_tokens(df, budget=8, n_groups=1).collect()
    chunks = {r["chunk"]: r for r in out}
    # group order is doc_id asc; total 16 tokens -> chunks of 8/8
    assert set(chunks) == {0, 1}
    assert chunks[0]["n_tok"] == 8 and chunks[1]["n_tok"] == 8
    # round-trip: concatenating chunks in order reproduces the corpus
    # in id order
    flat = chunks[0]["tokens"] + chunks[1]["tokens"]
    assert flat == list(range(0, 6)) + list(range(10, 17)) \
        + list(range(20, 23))
    # spans: d1 crosses the boundary and appears in both chunks
    s0 = [(s["doc_id"], s["start"], s["len"]) for s in chunks[0]["spans"]]
    s1 = [(s["doc_id"], s["start"], s["len"]) for s in chunks[1]["spans"]]
    assert s0 == [("d0", 0, 6), ("d1", 6, 2)]
    assert s1 == [("d1", 0, 5), ("d3", 5, 3)]
    # zero-length and NULL docs contribute no span anywhere
    assert all(s[0] not in ("d2", "d2b") for s in s0 + s1)
