"""Training-data ops: dedup (exact / jaccard / minhash+LSH / simhash),
similarity search (brute force vs numpy; LSH recall), text stats,
multimodal plumbing.  Cross-checked against independent numpy/pure-
Python oracles (the GROUPED_MAP cross-check pattern)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_contrib_spark.datapipe.dedup import (
    embedding_neardup_pairs, exact_dedup, minhash_lsh_dedup,
    ngram_jaccard_pairs, simhash_fingerprints, simhash_near_pairs,
    simhash_near_pairs_blocked)
from opentelemetry_collector_contrib_spark.datapipe.multimodal import (
    MEDIA_SCHEMA, decode_image_batch, extract_features, frame_sample,
    synth_media)
from opentelemetry_collector_contrib_spark.datapipe.similarity import (
    cosine_topk, lsh_topk)
from opentelemetry_collector_contrib_spark.datapipe.textstats import (
    bpe_ish_token_count, fingerprint, lang_id, quality_features, token_count)

from conftest import rows

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog today"),
    ("d2", "the quick brown fox jumps over the lazy dog today"),   # exact dup
    ("d3", "the quick brown fox jumps over the lazy dog yesterday"),  # near dup
    ("d4", "completely different content about spark engines and shuffles"),
    ("d5", "Der Hund und die Katze sind nicht mit auf der Couch"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _py_jaccard(a: str, b: str, k: int = 3) -> float:
    def sh(t):
        import re
        w = [x for x in re.sub(r"[^a-z0-9]+", " ", t.lower()).split() if x]
        return set(" ".join(w[i:i + k]) for i in range(len(w) - k + 1))
    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_exact_dedup(spark):
    out = {r["keep_id"]: r["dup_count"]
           for r in exact_dedup(_docs(spark)).collect()}
    assert out["d1"] == 2          # d1==d2
    assert out["d3"] == 1
    assert len(out) == 4


def test_jaccard_matches_python(spark):
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()}
    texts = dict(DOCS)
    for (a, b), j in got.items():
        assert abs(j - _py_jaccard(texts[a], texts[b])) < 1e-12
    assert got[("d1", "d2")] == 1.0
    assert ("d1", "d3") in got


def test_jaccard_capped_equals_uncapped_when_cap_exceeds_df(spark):
    """With max_df above every shingle's document frequency the capped
    operator is the exact operator — same pairs, same jaccard."""
    from opentelemetry_collector_contrib_spark.datapipe.dedup import \
        ngram_jaccard_pairs_capped
    want = sorted(map(tuple, ngram_jaccard_pairs(
        _docs(spark), threshold=0.3).collect()))
    got = sorted(map(tuple, ngram_jaccard_pairs_capped(
        _docs(spark), threshold=0.3, max_df=10_000).collect()))
    assert got == want


def test_jaccard_capped_drops_hot_shingle_and_bounds_fanout(spark):
    """A boilerplate shingle shared by EVERY doc is excluded from
    candidate generation: 40 docs whose only common content is a
    header k-gram produce ZERO pairs capped (vs 40*39/2 = 780 join
    rows uncapped), and the hot set is removed via a BROADCAST
    anti-join (fact side unshuffled for the filter)."""
    from opentelemetry_collector_contrib_spark.datapipe.dedup import \
        ngram_jaccard_pairs_capped
    docs = spark.createDataFrame(
        [(f"d{i}", f"shared boilerplate header unique{i} tail{i} end{i}")
         for i in range(40)], "doc_id string, text string")
    capped = ngram_jaccard_pairs_capped(docs, threshold=0.01, max_df=4)
    assert capped.count() == 0
    assert ngram_jaccard_pairs(docs, threshold=0.01).count() == 780
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # size guard (ADVICE r03): a hot set over the broadcast limit must
    # NOT be hint-broadcast (planner picks a bounded shuffled anti
    # join) — and the result is unchanged
    guarded = ngram_jaccard_pairs_capped(docs, threshold=0.01, max_df=4,
                                         hot_broadcast_limit=0)
    assert guarded.count() == 0
    gplan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in gplan
    assert ("SortMergeJoin" in gplan or "ShuffledHashJoin" in gplan
            or "BroadcastHashJoin" not in gplan.split("LeftAnti")[0])


def test_minhash_lsh_finds_near_dups(spark):
    got = {(r["id_a"], r["id_b"]) for r in
           minhash_lsh_dedup(_docs(spark), threshold=0.5).collect()}
    assert ("d1", "d2") in got            # exact dup always collides
    assert all(p[0] != "d4" and p[1] != "d4" for p in got)


def test_lsh_star_candidates_linear_in_bucket_size(spark):
    """A planted boilerplate cluster — D near-identical templated docs
    that all share every band bucket — must produce O(D * BANDS)
    candidate rows on the star path, not the O(D^2) the all-pairs
    verifier emits.  This is the 100-TB web-corpus shape (same page
    modulo a counter) that makes all-pairs a job-killer."""
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        lsh_candidate_edges_star, lsh_candidate_pairs, minhash_signatures)
    from opentelemetry_collector_contrib_spark.datapipe.hashing import BANDS
    d = 80
    base = "breaking news template header shared across every page footer"
    docs = spark.createDataFrame(
        [(f"d{i:04d}", base) for i in range(d)], "doc_id string, text string")
    sig = minhash_signatures(docs, k=3).persist()
    try:
        star = lsh_candidate_edges_star(sig).count()
        allp = lsh_candidate_pairs(sig).count()
    finally:
        sig.unpersist()
    assert allp == d * (d - 1) // 2        # the quadratic shape
    # identical docs share every bucket -> one hub total: D-1 edges;
    # the bound we rely on at scale is per-band-linear.
    assert star == d - 1
    assert star <= (d - 1) * BANDS


def test_lsh_star_clusters_equal_all_pairs_after_cc(spark):
    """Star candidates drop (a, b) edges inside a bucket but keep the
    hub spanning edges — after connected components the duplicate
    clusters must match the all-pairs path on a corpus of
    near-identical template groups (the case the star path optimizes)."""
    from opentelemetry_collector_contrib_spark.datapipe.cluster import \
        connected_components
    rows_ = []
    for g in range(4):
        for i in range(6):
            rows_.append((f"g{g}x{i}",
                          f"group {g} template body shared words alpha beta "
                          f"gamma delta epsilon zeta eta theta v{i}"))
    rows_.append(("solo", "completely different text about unrelated topics"))
    docs = spark.createDataFrame(rows_, "doc_id string, text string")
    nodes = docs.select(F.col("doc_id").alias("id"))

    def clusters(candidates):
        pairs = minhash_lsh_dedup(docs, threshold=0.5,
                                  candidates=candidates).select("id_a", "id_b")
        comp = connected_components(nodes, pairs)
        return sorted(map(tuple, comp.collect()))

    assert clusters("star") == clusters("all_pairs")


def test_simhash_identical_and_blocked_equals_bruteforce(spark):
    fp = simhash_fingerprints(_docs(spark))
    vals = {r["id"]: r["simhash"] for r in fp.collect()}
    assert vals["d1"] == vals["d2"]
    brute = rows(simhash_near_pairs(fp, max_hamming=6))
    blocked = rows(simhash_near_pairs_blocked(fp, max_hamming=6))
    assert brute == blocked                # pigeonhole blocking is exact


def test_text_features_fused_equals_catalyst(spark):
    """The fused Arrow hot path must be value-identical to the
    per-feature Catalyst expression forms (incl. rounding and ties)."""
    from opentelemetry_collector_contrib_spark.datapipe.textstats import (
        text_features)
    edge = [("e1", ""), ("e2", "!!! ??? ..."), ("e3", "the the the"),
            ("e4", "der die und the and of xx yy zz 123 456")]
    docs = spark.createDataFrame(DOCS + edge, "doc_id string, text string")
    cols = ["doc_id", "pred_lang", "n_chars_m", "n_words", "n_punct",
            "mean_word_len", "punct_ratio", "stopword_ratio",
            "quality_score", "n_bpe", "fingerprint"]
    fused = text_features(docs).select(*cols)
    cat = fingerprint(
        quality_features(lang_id(docs))
        .withColumn("n_bpe", bpe_ish_token_count(F.col("text")))).select(*cols)
    assert sorted(map(tuple, fused.collect())) == \
        sorted(map(tuple, cat.collect()))


def test_repetition_stats_matches_python(spark):
    from collections import Counter
    from opentelemetry_collector_contrib_spark.datapipe.textstats import (
        repetition_stats)
    docs = DOCS + [("r1", "spam spam spam spam spam"), ("r2", ""),
                   ("r3", "one"), ("r4", "a b a b a b a b c")]
    got = {r["doc_id"]: r for r in repetition_stats(
        spark.createDataFrame(docs, "doc_id string, text string")).collect()}
    import re as _re
    for doc_id, text in docs:
        w = [x for x in _re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if x]
        grams = [f"{w[i]} {w[i+1]}" for i in range(len(w) - 1)]
        r = got[doc_id]
        assert r["n_2grams"] == len(grams)
        assert r["top_2gram_count"] == (max(Counter(grams).values())
                                        if grams else 0)
        if w:
            assert abs(r["dup_word_frac"]
                       - round(1.0 - len(set(w)) / len(w), 6)) < 1e-9
    assert got["r1"]["top_2gram_frac"] == 1.0      # all grams identical
    assert got["r2"]["n_2grams"] == 0
    assert got["r3"]["n_2grams"] == 0


def test_hash_sample_deterministic_and_rate(spark):
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        hash_sample, train_split_column)
    df = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    a = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    b = sorted(r["doc_id"] for r in hash_sample(df, 0.25).collect())
    assert a == b                         # resume-safe: identical subset
    assert 0.2 < len(a) / 4000 < 0.3      # ~rate
    # nested property: a lower-rate sample is a subset of a higher-rate
    # one (same salt -> same hash ordering)
    c = set(r["doc_id"] for r in hash_sample(df, 0.10).collect())
    assert c <= set(a)
    # split is stable and ~10% val
    s = {r["doc_id"]: r["s"] for r in
         df.withColumn("s", train_split_column("doc_id")).collect()}
    n_val = sum(1 for v in s.values() if v == "val")
    assert 0.06 < n_val / 4000 < 0.14
    s2 = {r["doc_id"]: r["s"] for r in
          df.withColumn("s", train_split_column("doc_id")).collect()}
    assert s == s2


def test_scrub_pii(spark):
    from opentelemetry_collector_contrib_spark.datapipe.textstats import (
        scrub_pii)
    rows_in = [
        ("a", "conn from 10.1.2.3 user bob@example.com ok"),
        ("b", "no pii here"),
        ("c", "ips 1.2.3.4 and 5.6.7.8"),
    ]
    df = spark.createDataFrame(rows_in, "doc_id string, body string")
    got = {r["doc_id"]: r for r in scrub_pii(df, "body").collect()}
    assert got["a"]["scrubbed"] == "conn from [IP] user [EMAIL] ok"
    assert (got["a"]["n_ip"], got["a"]["n_email"]) == (1, 1)
    assert got["b"]["scrubbed"] == "no pii here"
    assert (got["b"]["n_ip"], got["b"]["n_email"]) == (0, 0)
    assert got["c"]["scrubbed"] == "ips [IP] and [IP]"
    assert got["c"]["n_ip"] == 2


def test_simhash_block_bounds_partition_all_bits():
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        SIMHASH_BITS, simhash_block_bounds)
    assert SIMHASH_BITS == 60              # fits BIGINT sum in the oracle
    for mh in (1, 2, 3, 6):
        bounds = simhash_block_bounds(mh)
        assert len(bounds) == mh + 1
        assert sum(w for _, w in bounds) == SIMHASH_BITS   # full coverage
        shift = 0
        for s, w in bounds:                # contiguous, no overlap
            assert s == shift and w > 0
            shift += w


def test_simhash_block_buckets_spread(spark):
    """The 15-bit blocks must spread random docs thinly — the scale
    property the 8-bit round-1 blocks lacked (~N/256 per bucket)."""
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        simhash_block_bounds)
    import hashlib
    n = 400
    # fully-disjoint random word sets -> near-uniform fingerprints
    # (shared-vocabulary docs legitimately cluster: that's the operator)
    docs = spark.createDataFrame(
        [(f"r{i}", " ".join(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8]
                            for j in range(12)))
         for i in range(n)], "doc_id string, text string")
    fp = simhash_fingerprints(docs)
    bounds = simhash_block_bounds(3)
    blocks = F.array(*[
        F.struct(F.lit(i).alias("blk"),
                 F.shiftright(F.col("simhash"), s)
                 .bitwiseAND(F.lit((1 << w) - 1)).alias("val"))
        for i, (s, w) in enumerate(bounds)])
    sizes = (fp.select(F.explode(blocks).alias("b"))
             .groupBy("b.blk", "b.val").count().collect())
    # random-ish 15-bit blocks over 400 docs: collisions are rare —
    # no bucket should hold more than ~1% of docs
    assert max(r["count"] for r in sizes) <= 4


VECS = [
    ("v1", [1.0, 0.0, 0.0, 0.0]),
    ("v2", [0.9, 0.1, 0.0, 0.0]),
    ("v3", [0.0, 1.0, 0.0, 0.0]),
    ("v4", [0.0, 0.0, 1.0, 1.0]),
]


def _vecs(spark):
    return spark.createDataFrame(VECS, "vec_id string, embedding array<float>")


def test_cosine_topk_matches_numpy(spark):
    out = cosine_topk(_vecs(spark), k=2)
    got = {(r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()}
    m = {k: np.array(v) for k, v in VECS}
    for q in m:
        sims = sorted(((float(m[q] @ m[o] / (np.linalg.norm(m[q]) * np.linalg.norm(m[o]))), o)
                       for o in m if o != q), key=lambda t: (-round(t[0], 6), t[1]))
        assert got[(q, 1)] == sims[0][1]
        assert got[(q, 2)] == sims[1][1]


def test_embedding_neardup(spark):
    got = {(r["id_a"], r["id_b"]) for r in
           embedding_neardup_pairs(_vecs(spark), threshold=0.9,
                                   id_col="vec_id").collect()}
    assert got == {("v1", "v2")}


def test_lsh_topk_is_subset_of_bruteforce_pairs(spark):
    """LSH may miss candidates but must never invent similarities."""
    exact = {(r["query_id"], r["neighbor_id"]): r["cosine"]
             for r in cosine_topk(_vecs(spark), k=3).collect()}
    for r in lsh_topk(_vecs(spark), dim=4, k=3).collect():
        key = (r["query_id"], r["neighbor_id"])
        assert key in exact
        assert r["cosine"] == exact[key]


def test_textstats(spark):
    df = spark.createDataFrame(
        [("t1", "the cat and the dog, it was good!!"),
         ("t2", "der hund und die katze"),
         ("t3", "")],
        "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           quality_features(lang_id(df)).withColumn(
               "n_ws", token_count(F.col("text"))).withColumn(
               "n_bpe", bpe_ish_token_count(F.col("text"))).collect()}
    assert out["t1"]["pred_lang"] == "en"
    assert out["t2"]["pred_lang"] == "de"
    assert out["t3"]["pred_lang"] == "unk"
    assert out["t1"]["n_ws"] == 8
    assert out["t1"]["n_punct"] == 3          # , ! !
    assert out["t3"]["quality_score"] == 0.1  # empty: only punct<0.1 arm
    assert out["t1"]["n_bpe"] > out["t1"]["n_ws"]


def test_fingerprint_normalization_invariant(spark):
    df = spark.createDataFrame(
        [("a", "Hello,   World!"), ("b", "hello world"), ("c", "other")],
        "doc_id string, text string")
    got = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df).collect()}
    assert got["a"] == got["b"]
    assert got["a"] != got["c"]


def test_multimodal_features(spark):
    media = synth_media(spark, n=12)
    out = extract_features(media).collect()
    assert len(out) == 12
    for r in out:
        assert r["ok"] and 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
        assert len(r["checksum"]) == 32


def _has_pil():
    try:
        import PIL  # noqa: F401
        return True
    except ImportError:
        return False


def _ppm_bmp_media(spark):
    """Real PPM + BMP blobs (known dims) + one garbage blob."""
    import numpy as np

    from opentelemetry_collector_contrib_spark.datapipe.imagecodec import (
        encode_bmp, encode_ppm)
    rng = np.random.default_rng(7)
    ppm = encode_ppm(rng.integers(0, 256, (30, 40, 3), dtype=np.uint8))
    bmp = encode_bmp(rng.integers(0, 256, (25, 50, 3), dtype=np.uint8))
    rows = [("ppm-1", "image", bytearray(ppm), "image/x-ppm", len(ppm)),
            ("bmp-1", "image", bytearray(bmp), "image/bmp", len(bmp)),
            ("bad-1", "image", bytearray(b"not an image"), "image/png", 12)]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_multimodal_real_decode_any_backend(spark):
    """The REAL decode branch (fake=False) executes in THIS container:
    with Pillow absent the stdlib PPM/BMP codec parses the headers
    (both formats Pillow also handles, so the test is backend-
    agnostic); garbage is flagged ok=False and kept."""
    got = {r["media_id"]: r for r in
           extract_features(_ppm_bmp_media(spark), fake=False).collect()}
    assert (got["ppm-1"]["width"], got["ppm-1"]["height"]) == (40, 30)
    assert (got["bmp-1"]["width"], got["bmp-1"]["height"]) == (50, 25)
    assert got["ppm-1"]["ok"] and got["bmp-1"]["ok"]
    assert not got["bad-1"]["ok"]


@pytest.mark.skipif(not _has_pil(), reason="needs Pillow")
def test_multimodal_real_decode_with_pil(spark):
    """Real decode path (optional dependency): a PIL-generated PNG
    decodes to its true dimensions; a garbage blob is flagged ok=False
    rather than killing the batch."""
    import io

    from PIL import Image
    buf = io.BytesIO()
    Image.new("RGB", (40, 30)).save(buf, format="PNG")
    rows = [("ok-1", "image", bytearray(buf.getvalue()), "image/png",
             buf.getbuffer().nbytes),
            ("bad-1", "image", bytearray(b"not an image"), "image/png", 12)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           extract_features(df, fake=False).collect()}
    assert (got["ok-1"]["width"], got["ok-1"]["height"]) == (40, 30)
    assert got["ok-1"]["ok"] and not got["bad-1"]["ok"]

    from opentelemetry_collector_contrib_spark.datapipe.multimodal import (
        resize_images)
    out = {r["media_id"]: r for r in
           resize_images(df, target_w=20, target_h=20,
                         fake=False).collect()}
    assert (out["ok-1"]["target_w"], out["ok-1"]["target_h"]) == (20, 15)
    with Image.open(io.BytesIO(bytes(out["ok-1"]["payload"]))) as im:
        assert (im.width, im.height) == (20, 15)
    assert not out["bad-1"]["ok"]


def test_multimodal_resize_plumbing(spark):
    from opentelemetry_collector_contrib_spark.datapipe.multimodal import (
        resize_images)
    media = synth_media(spark, n=12)
    out = resize_images(media, target_w=64, target_h=64).collect()
    assert len(out) == 12
    for r in out:
        # aspect-preserving single factor, never upscaled
        assert 0 < r["scale"] <= 1.0
        assert r["target_w"] <= 64 or r["target_h"] <= 64
        assert abs(r["target_w"] - int(r["width"] * r["scale"])) <= 1
        assert r["payload"] is not None and r["ok"]
    big = resize_images(media, target_w=10000, target_h=10000).collect()
    assert all(r["scale"] == 1.0 for r in big)   # never upscale


def test_multimodal_real_resize_any_backend(spark):
    """Real resize (fake=False): decode -> aspect-preserving downscale
    -> re-encode; the resized payload re-decodes (via the same
    extract_features real path) to the target dims."""
    from opentelemetry_collector_contrib_spark.datapipe.multimodal import (
        resize_images)
    out = resize_images(_ppm_bmp_media(spark), target_w=20, target_h=20,
                        fake=False)
    got = {r["media_id"]: r for r in out.collect()}
    # 40x30 -> scale 0.5 -> 20x15; 50x25 -> scale 0.4 -> 20x10
    assert (got["ppm-1"]["target_w"], got["ppm-1"]["target_h"]) == (20, 15)
    assert (got["bmp-1"]["target_w"], got["bmp-1"]["target_h"]) == (20, 10)
    assert not got["bad-1"]["ok"]
    redecoded = {r["media_id"]: r for r in extract_features(
        out.selectExpr("media_id", "kind", "payload",
                       "'image/any' AS mime",
                       "CAST(length(payload) AS INT) AS n_bytes")
        .where("ok"), fake=False).collect()}
    assert (redecoded["ppm-1"]["width"],
            redecoded["ppm-1"]["height"]) == (20, 15)
    assert (redecoded["bmp-1"]["width"],
            redecoded["bmp-1"]["height"]) == (20, 10)


def test_imagecodec_roundtrip_and_resize():
    """Pure-codec unit checks: PPM/BMP encode->decode round-trips the
    pixel array exactly; nearest-neighbor resize picks true source
    pixels; malformed payloads raise ImageCodecError."""
    import numpy as np

    from opentelemetry_collector_contrib_spark.datapipe.imagecodec import (
        ImageCodecError, decode, decode_ppm, encode_bmp, encode_ppm,
        resize_nearest)
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    assert np.array_equal(decode(encode_ppm(rgb)), rgb)
    assert np.array_equal(decode(encode_bmp(rgb)), rgb)
    # comments + arbitrary whitespace in the PPM header
    ppm = b"P6\n# a comment\n17\n # more\n13 255\n" + rgb.tobytes()
    assert np.array_equal(decode_ppm(ppm), rgb)
    # 2x downscale of a 2x2 checkerboard blown up 2x: centers land on
    # the original quadrants
    board = np.zeros((4, 4, 3), dtype=np.uint8)
    board[:2, 2:] = 255
    board[2:, :2] = 128
    small = resize_nearest(board, 2, 2)
    assert small[0, 0, 0] == 0 and small[0, 1, 0] == 255
    assert small[1, 0, 0] == 128 and small[1, 1, 0] == 0
    for bad in (b"", b"P6", b"BMxx", b"P6\n2 2\n255\nxy",
                encode_bmp(rgb)[:40]):
        with pytest.raises(ImageCodecError):
            decode(bad)


def test_frame_sample_deterministic(spark):
    media = synth_media(spark, n=64)
    a = sorted(r["media_id"] for r in frame_sample(media, 4).collect())
    b = sorted(r["media_id"] for r in frame_sample(media, 4).collect())
    assert a == b and 0 < len(a) < 64


def test_dedup_survivors_policies(spark):
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        dedup_survivors)
    df = spark.createDataFrame(
        [("d1", "same text"), ("d2", "same text"),
         ("d3", "short"), ("d4", "short but longer")],
        "doc_id string, text string")
    longest = {r["doc_id"]: r["dup_count"]
               for r in dedup_survivors(df).collect()}
    assert longest == {"d1": 2, "d3": 1, "d4": 1}   # d1 ties -> smaller id
    first = {r["doc_id"] for r in
             dedup_survivors(df, policy="first").collect()}
    assert first == {"d1", "d3", "d4"}


def test_token_ngram_profile_interval_merge(spark):
    # d1 fully contains d2's token stream: the three shared 13-grams
    # cover tokens [0,15) in both docs after interval merge
    rows = [
        ("d1", list(range(1, 21))),          # 20 toks, grams 0..7
        ("d2", list(range(1, 16))),          # 15 toks, grams 0..2
        ("d3", list(range(100, 120))),       # unique -> no dup grams
        ("d4", [1, 2, 3, 4, 5]),             # shorter than n -> 0 grams
    ]
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        token_ngram_profile)
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    got = {r["id"]: r.asDict() for r in
           token_ngram_profile(df, n=13).collect()}
    assert got["d1"]["n_grams"] == 8
    assert got["d1"]["n_dup_grams"] == 3
    assert got["d1"]["covered_tokens"] == 15      # 1 + 1 + 13
    assert got["d1"]["dup_token_fraction"] == 15 / 20
    assert got["d2"]["n_dup_grams"] == 3
    assert got["d2"]["dup_token_fraction"] == 1.0
    assert got["d3"]["n_dup_grams"] == 0
    assert got["d3"]["covered_tokens"] == 0
    assert got["d4"]["n_grams"] == 0 and got["d4"]["n_dup_grams"] == 0


def test_stratified_sample_quota_and_upsample(spark):
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        stratified_sample)
    import pytest
    rows = [(f"d{i}", ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = stratified_sample(df, {"a": 2.0, "b": 0.5, "c": 0.0},
                            default=0.0).cache()
    per = {r["source"]: r for r in
           out.groupBy("source").agg(
               F.count(F.lit(1)).alias("n"),
               F.max("copy").alias("mx")).collect()}
    assert "c" not in per                      # zero quota drops stratum
    assert per["a"]["n"] == 200 and per["a"]["mx"] == 1   # exactly 2 copies
    assert 20 <= per["b"]["n"] <= 80 and per["b"]["mx"] == 0
    # deterministic: same subset on re-run
    again = stratified_sample(df, {"a": 2.0, "b": 0.5, "c": 0.0},
                              default=0.0)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, again.collect()))
    with pytest.raises(ValueError):
        stratified_sample(df, {"a": -1.0})


def test_tfidf_keywords_ranking(spark):
    from opentelemetry_collector_contrib_spark.datapipe.lm_score import (
        tfidf_keywords)
    import math
    docs = [
        ("a", "apple banana apple cherry"),
        ("b", "banana cherry cherry"),
        ("c", "apple durian"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {(r["id"], r["rank"]): r.asDict() for r in
           tfidf_keywords(df, top_k=2).collect()}
    # doc a: apple tf=2 df=2 score=2*ln(3/2); banana tf=1 df=2;
    # cherry tf=1 df=2 -> apple first, banana beats cherry on the
    # word tiebreak
    assert got[("a", 1)]["word"] == "apple"
    assert got[("a", 1)]["score"] == 2 * math.log(3 / 2)
    assert got[("a", 2)]["word"] == "banana"
    # doc c: durian df=1 idf=ln(3) outranks apple df=2
    assert got[("c", 1)]["word"] == "durian"
    assert got[("c", 1)]["df"] == 1
    assert len([k for k in got if k[0] == "b"]) == 2


def test_curation_pipeline_funnel(spark, tmp_path):
    """Composed cascade (quality gate -> exact dedup -> fuzzy dedup ->
    PII scrub -> split): funnel counts are monotone, observations fire
    with the single write action, survivors match running the stages
    individually."""
    from opentelemetry_collector_contrib_spark.datapipe.cluster import (
        cluster_survivors, connected_components)
    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        curation_pipeline)
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        dedup_survivors, minhash_lsh_dedup)
    from opentelemetry_collector_contrib_spark.datapipe.textstats import (
        text_features)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))
    # 'score' gate: the synthetic docs are far below Gopher's published
    # >=50-word web threshold (that path is exercised below)
    out, obs = curation_pipeline(docs, jaccard_threshold=0.5,
                                 quality="score", min_quality=0.8)
    out.write.mode("overwrite").parquet(str(tmp_path / "curated"))
    funnel = {k: int(o.get["n"]) for k, o in obs.items()}
    assert (funnel["input"] >= funnel["quality_pass"]
            >= funnel["exact_unique"] >= funnel["fuzzy_unique"] > 0)
    assert funnel["input"] > funnel["quality_pass"]   # the gate gates
    written = spark.read.parquet(str(tmp_path / "curated"))
    assert written.count() == funnel["fuzzy_unique"]
    assert set(r["split"] for r in
               written.select("split").distinct().collect()) <= {
                   "train", "val"}
    assert "clean_text" in written.columns
    # survivors equal the manually-chained stages
    feats = text_features(docs)
    gated = docs.join(
        feats.where(feats.quality_score >= 0.8).select("doc_id"), "doc_id")
    exact = dedup_survivors(gated, policy="longest").drop("dup_count")
    # candidates="star" mirrors the cascade's production generator
    # (strategy equivalence after CC has its own test above)
    pairs = minhash_lsh_dedup(exact, threshold=0.5, candidates="star")
    want = {r["doc_id"] for r in cluster_survivors(
        exact, connected_components(
            exact.selectExpr("doc_id AS id"),
            pairs.select("id_a", "id_b"))).collect()}
    got = {r["doc_id"] for r in written.select("doc_id").collect()}
    assert got == want
    # the strict Gopher gate rejects this corpus wholesale — the
    # cascade must produce a clean EMPTY result, not crash
    out2, obs2 = curation_pipeline(docs, quality="gopher")
    assert out2.count() == 0
    assert int(obs2["quality_pass"].get["n"]) == 0


def test_curation_staged_resume_equals_uninterrupted(spark, tmp_path):
    """Stage-checkpointed cascade: killing the run after stage K and
    resuming must produce output value-identical to an uninterrupted
    run (the curation mirror of test_pipeline_resume_equals_
    uninterrupted), completed stages must NOT recompute on resume, and
    the resumed funnel must carry the pre-kill stages' counts."""
    import json

    from opentelemetry_collector_contrib_spark.datapipe.curation import (
        CURATION_STAGES, curation_pipeline_staged)
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text"))

    def read_out(run_dir):
        return sorted(map(tuple, spark.read.parquet(f"{run_dir}/curated")
                          .select("doc_id", "clean_text", "split")
                          .collect()))

    base = str(tmp_path / "uninterrupted")
    want_funnel = curation_pipeline_staged(docs, base, quality="score",
                                           min_quality=0.8)
    want = read_out(base)
    assert want_funnel["fuzzy_unique"] == len(want) > 0

    for k, stage in enumerate(CURATION_STAGES[:-1]):
        run = str(tmp_path / f"kill_after_{stage}")
        partial = curation_pipeline_staged(docs, run, quality="score",
                                           min_quality=0.8,
                                           stop_after=stage)
        assert "fuzzy_unique" not in partial      # it really stopped
        funnel = curation_pipeline_staged(docs, run, quality="score",
                                          min_quality=0.8)
        assert read_out(run) == want
        assert funnel == want_funnel
        # completed stages were skipped, not recomputed: exactly one
        # manifest row per stage after the resume
        with open(f"{run}/manifest.jsonl") as f:
            stages = [json.loads(line)["unit"] for line in f]
        assert sorted(stages) == sorted(CURATION_STAGES)


def test_fit_quality_clf_beats_seeded_weights(spark):
    """Trained-model drop-in: logistic weights fit on a labeled sample
    separate a synthetic clean-vs-gibberish corpus near-perfectly,
    where the seeded stand-in is chance; same featurization, same
    quality_scores surface."""
    from opentelemetry_collector_contrib_spark.datapipe.quality_clf import (
        fit_quality_clf, quality_scores)
    clean = ("this is a clean well formed informative document about "
             "science and history with useful sentences")
    junk = "zxq vbn qqq kkz pp zz xx yy qq ww ee rr tt uu garbage spam"
    rows = []
    for i in range(120):
        base = clean if i % 2 == 0 else junk
        rows.append((i, f"{base} variant {i % 7}", i % 2 == 0))
    df = spark.createDataFrame(rows, "doc_id long, text string, label boolean")
    train = df.where(F.col("doc_id") < 80)
    test = df.where(F.col("doc_id") >= 80)
    W = fit_quality_clf(train, sample_n=80)
    scored = quality_scores(test, weights=W).join(
        test.select("doc_id", F.col("label").alias("want")), "doc_id")
    got = scored.collect()
    acc = sum(1 for r in got if r["label"] == r["want"]) / len(got)
    assert acc >= 0.95
    seeded = quality_scores(test).join(
        test.select("doc_id", F.col("label").alias("want")), "doc_id")
    seeded_acc = sum(1 for r in seeded.collect()
                     if r["label"] == r["want"]) / len(got)
    assert acc > seeded_acc


def test_token_contamination_fractions(spark):
    from opentelemetry_collector_contrib_spark.datapipe.dedup import (
        token_contamination)
    bench = spark.createDataFrame(
        [("b0", list(range(100, 120)))], "doc_id string, tokens array<int>")
    docs = spark.createDataFrame(
        [("member", list(range(100, 120))),          # exact benchmark doc
         ("half", list(range(100, 113)) + [999, 998, 997]),  # leading 13-gram only
         ("clean", list(range(500, 520))),           # disjoint
         ("short", [1, 2, 3])],                      # < n tokens
        "doc_id string, tokens array<int>")
    got = {r["id"]: r for r in
           token_contamination(docs, bench, n=13).collect()}
    assert got["member"]["hit_frac"] == 1.0
    assert got["member"]["n_grams"] == 8             # 20 - 13 + 1
    assert got["half"]["n_hit"] == 1                 # only grams fully inside
    assert got["clean"]["n_hit"] == 0
    assert got["short"] and got["short"]["n_grams"] == 0 \
        and got["short"]["hit_frac"] == 0.0
