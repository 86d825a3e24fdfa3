"""Chunked tokens generation (datagen._write_tokens).

sf > 1 corpora exceed pyarrow's int32 list-offset ceiling if built as
ONE ListArray (gen_tokens raises at ~2^31 corpus bytes), so ensure_sf
streams chunks through a ParquetWriter.  Pure pyarrow — no Spark.
"""

import pyarrow.parquet as pq

from opentelemetry_collector_contrib_spark import datagen


def test_chunked_tokens_deterministic_and_unique(tmp_path, monkeypatch):
    # shrink the chunk so the multi-chunk path runs at test scale
    monkeypatch.setattr(datagen, "TOKENS_CHUNK", 1000)
    p1, p2 = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    datagen._write_tokens(p1, 2500)          # 3 chunks: 1000/1000/500
    datagen._write_tokens(p2, 2500)
    t = pq.read_table(p1)
    assert t.num_rows == 2500
    ids = t.column("doc_id").to_pylist()
    assert len(set(ids)) == 2500             # global offset keeps ids unique
    assert ids[0] == "doc-00000000" and ids[-1] == "doc-00002499"
    # same sf -> same bytes (the ensure_sf determinism contract)
    assert open(p1, "rb").read() == open(p2, "rb").read()
    # schema identical to the single-shot path
    single = str(tmp_path / "c.parquet")
    datagen._write_tokens(single, 500)
    assert pq.read_schema(single).equals(pq.read_schema(p1))


def test_single_shot_path_unchanged(tmp_path, monkeypatch):
    """n <= TOKENS_CHUNK must keep the original one-stream draw order —
    earlier rounds' sf <= 1 fixtures must stay byte-identical."""
    import numpy as np
    p = str(tmp_path / "d.parquet")
    datagen._write_tokens(p, 1200)
    rng = np.random.default_rng(np.random.PCG64(datagen.SEED))
    want = datagen.gen_tokens(rng, 1200)
    got = pq.read_table(p)
    assert got.column("doc_id").to_pylist() == want.column("doc_id").to_pylist()
    assert got.column("n_tok").to_pylist() == want.column("n_tok").to_pylist()
