"""Corpus-wide line (paragraph) dedup: keep-first semantics, same-doc
duplicates, empty-line passthrough, reassembly order — cross-checked
against an independent pure-Python twin."""

import hashlib

from opentelemetry_collector_contrib_spark.datapipe.dedup import dedup_lines

from conftest import rows

DOCS = [
    # doc 1: "header" repeats in docs 2 and 3; "body one" unique;
    # internal duplicate line ("dup me" twice in the SAME doc)
    (1, "header\nbody one\ndup me\ndup me"),
    # doc 2: header drops (doc 1 owns it); has empty lines that must
    # pass through undeduped even though both docs have them
    (2, "header\n\nbody two\n\nbody two tail"),
    # doc 3: every line already seen -> zero kept
    (3, "header\ndup me"),
    # doc 4: untouched
    (4, "totally unique line\nanother unique line"),
]


def _twin(docs):
    """Pure-Python keep-first line dedup (ordered by (id, line_no))."""
    seen = set()
    out = {}
    for did, text in sorted(docs):
        kept, nl = [], 0
        for ln in text.split("\n"):
            nl += 1
            if ln == "":
                kept.append(ln)           # empties always survive
                continue
            if ln not in seen:
                seen.add(ln)
                kept.append(ln)
        out[did] = (nl, len(kept), nl - len(kept),
                    hashlib.md5("\n".join(kept).encode()).hexdigest())
    return out


def test_dedup_lines_matches_python_twin(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {r[0]: tuple(r[1:])
           for r in rows(dedup_lines(df),
                         "id", "n_lines", "n_kept", "n_dropped",
                         "kept_md5")}
    assert got == _twin(DOCS)


def test_dedup_lines_keep_first_is_ordered_by_id(spark):
    # the SAME line in docs 9 and 2 -> doc 2 keeps it, doc 9 drops it,
    # regardless of input row order
    docs = [(9, "shared line"), (2, "shared line")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r[0]: r[1] for r in rows(dedup_lines(df), "id", "n_kept")}
    assert got == {2: 1, 9: 0}


def test_dedup_lines_zero_kept_doc_hashes_empty_string(spark):
    df = spark.createDataFrame(
        [(1, "only line"), (2, "only line")], "doc_id int, text string")
    got = {r[0]: r[1] for r in rows(dedup_lines(df), "id", "kept_md5")}
    assert got[2] == hashlib.md5(b"").hexdigest()
