"""Regression tests for the round-4 ADVICE findings.

Each test pins the FIXED behavior so a refactor cannot silently
reintroduce the original defect:
  1. url_normalize must handle tracking params in any query position
     (the old single-rule chain corrupted '?a=1&utm_x=2&b=3').
  2. Zero-shingle docs get a NULL minhash signature (not the shared
     sentinel accumulator) and never band together.
  3. The gini int64 fast-path overflow guard must trip on large
     NEGATIVE magnitudes too, falling back to exact bigint arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_url_normalize_positions(spark):
    from fastetl_spark.operators.text3 import url_normalize

    cases = [
        # (input, expected)
        ("https://EX.com/p?utm_source=x&b=2", "https://ex.com/p?b=2"),
        ("https://ex.com/p?a=1&utm_x=2&b=3", "https://ex.com/p?a=1&b=3"),
        ("https://ex.com/p?a=1&gclid=z", "https://ex.com/p?a=1"),
        ("https://ex.com/p?utm_a=1&utm_b=2", "https://ex.com/p"),
        ("https://ex.com/p?utm_a=1&utm_b=2&c=3", "https://ex.com/p?c=3"),
        ("https://ex.com/p?a=1#frag", "https://ex.com/p?a=1"),
        ("https://ex.com/p?fbclid=q#x", "https://ex.com/p"),
        ("https://Ex.com/CaseKept?Q=UPPER", "https://ex.com/CaseKept?Q=UPPER"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r[0] for r in df.select(url_normalize(F.col("url"))).collect()]
    assert got == [e for _, e in cases]


def test_minhash_empty_shingles_null_signature(spark):
    from fastetl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature_from_hashes,
    )

    df = spark.createDataFrame(
        [
            (1, [11, 22, 33]),
            (2, []),  # too-short doc: zero shingles
            (3, []),  # second zero-shingle doc — must NOT pair with 2
            (4, [11, 22, 33]),
        ],
        "doc_id long, hs array<long>",
    )
    sigs = df.select(
        "doc_id", minhash_signature_from_hashes(F.col("hs")).alias("sig")
    )
    by_id = {r.doc_id: r.sig for r in sigs.collect()}
    assert by_id[2] is None and by_id[3] is None
    assert by_id[1] is not None and by_id[1] == by_id[4]
    pairs = {
        (r.id_a, r.id_b)
        for r in lsh_candidate_pairs(sigs, "doc_id", "sig").collect()
    }
    assert pairs == {(1, 4)}  # identical docs pair; empty docs never do


def test_gini_negative_overflow_guard():
    # Values of ~|2e12| quantize to |2e18| at 1e-6 units: with n=3 the
    # int64 fast path would overflow (9*2e18 >> 2**62) yet the old
    # max-only guard saw q[-1]=1e6 and took it anyway. Compare the
    # production scalar against exact Python bigint arithmetic.
    import math

    from fastetl_spark.operators.multimodal import _Q_UNIT, gini_scalar

    vals = [-2.0e12, -1.0, 1.0]
    q = sorted(int(math.floor(v * _Q_UNIT + 0.5)) for v in vals)
    n = len(q)
    total = sum(q)
    rank_sum = sum((i + 1) * v for i, v in enumerate(q))
    expected = 2 * rank_sum / (n * total) - (n + 1) / n

    got = gini_scalar(vals)
    assert abs(got - expected) < 1e-12
    # and the positive-domain fast path still agrees with bigints
    pos = [1.5, 2.25, 99.0, 0.125]
    qp = sorted(int(math.floor(v * _Q_UNIT + 0.5)) for v in pos)
    np_ = len(qp)
    exp_pos = 2 * sum((i + 1) * v for i, v in enumerate(qp)) / (
        np_ * sum(qp)
    ) - (np_ + 1) / np_
    assert abs(gini_scalar(pos) - exp_pos) < 1e-12
    # TOTAL can overflow int64 even when values are positive: three
    # 3.2e12 values quantize to 3.2e18 each, sum 9.6e18 > 2^63-1 wraps
    # in numpy — the guard must route the total to bigints too
    big = [3.2e12, 3.2e12, 3.2e12]
    qb = sorted(int(math.floor(v * _Q_UNIT + 0.5)) for v in big)
    nb = len(qb)
    exp_big = 2 * sum((i + 1) * v for i, v in enumerate(qb)) / (
        nb * sum(qb)
    ) - (nb + 1) / nb
    assert abs(gini_scalar(big) - exp_big) < 1e-12
