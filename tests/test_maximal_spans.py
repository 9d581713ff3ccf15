"""Unit pins for maximal_dup_spans (suffix-array-style span dedup).

The differential suite hash-matches the gated query against DuckDB;
these tests pin the merge semantics on a hand-built corpus where the
expected spans are computable by eye: overlapping duplicated windows
merge into ONE maximal span, a gap larger than the window width starts
a new span, and within-document repetition counts as duplication.
"""

from __future__ import annotations

from fastetl_spark.operators.curation import maximal_dup_spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _tok(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_cross_doc_repeated_span_is_maximal(spark):
    # Docs 1 and 2 share tokens s0..s9 (10 tokens) embedded at different
    # offsets in otherwise-unique text; with k=4 every window inside the
    # shared run duplicates, and they must merge to ONE span of length
    # 10 per doc — not seven 4-token spans.
    shared = " ".join(f"s{i}" for i in range(10))
    d = _docs(
        spark,
        [
            (1, _tok(5, "a") + " " + shared + " " + _tok(5, "b")),
            (2, _tok(3, "c") + " " + shared + " " + _tok(7, "d")),
        ],
    )
    spans = {
        r["doc_id"]: (r["start_tok"], r["end_tok"], r["span_len"], r["n_windows"])
        for r in maximal_dup_spans(d, k=4).collect()
    }
    # doc 1: shared run occupies token positions 6..15 (1-based)
    assert spans[1] == (6, 15, 10, 7)
    # doc 2: shared run occupies token positions 4..13
    assert spans[2] == (4, 13, 10, 7)


def test_gap_splits_spans(spark):
    # Two disjoint shared runs separated by unique filler wider than k:
    # must yield TWO spans per doc.
    run1 = " ".join(f"x{i}" for i in range(5))
    run2 = " ".join(f"y{i}" for i in range(5))
    d = _docs(
        spark,
        [
            (1, run1 + " " + _tok(8, "u") + " " + run2),
            (2, run1 + " " + _tok(8, "v") + " " + run2),
        ],
    )
    out = maximal_dup_spans(d, k=4).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["end_tok"], r["span_len"])
        )
    for doc in (1, 2):
        assert sorted(per_doc[doc]) == [(1, 5, 5), (14, 18, 5)]


def test_within_doc_repetition_counts(spark):
    # A single document repeating its own 6-token phrase twice: both
    # occurrences are repeated spans even with no other document.
    phrase = " ".join(f"p{i}" for i in range(6))
    d = _docs(spark, [(7, phrase + " " + _tok(10, "z") + " " + phrase)])
    out = sorted(
        (r["start_tok"], r["end_tok"]) for r in maximal_dup_spans(d, k=6).collect()
    )
    assert out == [(1, 6), (17, 22)]


def test_no_duplication_no_rows(spark):
    d = _docs(spark, [(1, _tok(20, "a")), (2, _tok(20, "b"))])
    assert maximal_dup_spans(d, k=5).count() == 0
