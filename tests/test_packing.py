"""Unit pins for sequence packing (operators/packing.py).

The differential suite hash-matches the gated layout query; these tests
pin the layout INVARIANTS on fixtures where the hierarchy is actually
exercised (bucket_span smaller than the doc count, so the two-level
prefix sum crosses bucket boundaries):

- every sequence except the last is exactly full,
- fragments reassemble every document exactly (contiguous, complete),
- the hierarchical prefix sum equals the straightforward serial cumsum.
"""

from __future__ import annotations

from fastetl_spark.operators.packing import global_token_offsets, pack_sequences


def _docs(spark, n, words_of):
    rows = [(i, " ".join(f"d{i}w{j}" for j in range(words_of(i)))) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_offsets_match_serial_cumsum_across_buckets(spark):
    lens = [(i, 3 + (i * 7) % 11) for i in range(50)]
    df = spark.createDataFrame(lens, "doc_id bigint, n_tok bigint")
    got = {
        r["doc_id"]: r["off"]
        for r in global_token_offsets(df, "doc_id", "n_tok", bucket_span=8).collect()
    }
    acc = 0
    for i, n in lens:
        assert got[i] == acc
        acc += n


def test_sequences_full_and_docs_reassemble(spark):
    # 40 docs, 5-17 tokens each, capacity 16, bucket_span 8: plenty of
    # straddling fragments and bucket crossings
    d = _docs(spark, 40, lambda i: 5 + (i * 5) % 13)
    out = pack_sequences(d, capacity=16, bucket_span=8).collect()
    total = sum(5 + (i * 5) % 13 for i in range(40))
    # per-sequence fullness
    per_seq = {}
    for r in out:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["frag_len"]
    last = max(per_seq)
    assert set(per_seq) == set(range(last + 1))  # no holes
    for s, filled in per_seq.items():
        assert filled == 16 or (s == last and 0 < filled <= 16)
    assert sum(per_seq.values()) == total
    # per-doc reassembly: fragments tile [0, n_tok) contiguously
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_tok_start"], r["frag_len"], r["seq_id"], r["start_in_seq"])
        )
    for i in range(40):
        n_tok = 5 + (i * 5) % 13
        frags = sorted(per_doc[i])
        pos = 0
        for start, ln, _, _ in frags:
            assert start == pos and ln > 0
            pos += ln
        assert pos == n_tok
    # fragment starts inside a sequence never overlap
    placed = {}
    for r in out:
        span = (r["seq_id"], r["start_in_seq"], r["start_in_seq"] + r["frag_len"])
        for s, a, b in placed.get(r["seq_id"], []):
            assert b <= span[1] or span[2] <= a
        placed.setdefault(r["seq_id"], []).append(span)


def test_single_doc_larger_than_capacity_spans_many_sequences(spark):
    d = _docs(spark, 1, lambda i: 100)
    out = sorted(
        (r["seq_id"], r["start_in_seq"], r["doc_tok_start"], r["frag_len"])
        for r in pack_sequences(d, capacity=32).collect()
    )
    assert out == [(0, 0, 0, 32), (1, 0, 32, 32), (2, 0, 64, 32), (3, 0, 96, 4)]
