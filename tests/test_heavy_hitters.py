"""Misra-Gries heavy hitters: exact-twin equivalence and the
frequency-guarantee property the bounded-k production variant rests on
(it registers rows-only — these tests ARE its correctness evidence)."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastetl_spark.operators.heavy_hitters import (
    _HH_PRODUCTION_K,
    _doc_tokens,
    heavy_hitters_exhaustive,
    misra_gries_topk,
)


def _exact_counts(tokens):
    return {
        r["token"]: r["c"]
        for r in tokens.groupBy("token").agg(F.count(F.lit(1)).alias("c")).collect()
    }


def test_exhaustive_equals_groupby(spark, sf_dir):
    got = heavy_hitters_exhaustive(spark, sf_dir).collect()
    exact = _exact_counts(_doc_tokens(spark, sf_dir))
    want = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[: len(got)]
    assert [(r["token"], r["est_count"]) for r in got] == want
    assert all(r["err_bound"] == 0 for r in got)
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))


def test_bounded_k_guarantee(spark, sf_dir):
    tokens = _doc_tokens(spark, sf_dir)
    exact = _exact_counts(tokens)
    total = sum(exact.values())
    # large topk so we see the whole merged summary, not just the head
    got = misra_gries_topk(tokens, _HH_PRODUCTION_K, topk=100_000).collect()
    assert got, "summary must not be empty"
    err = got[0]["err_bound"]
    # decrement mass is bounded by total token mass / (k+1)... per
    # partition; globally it must stay under the total mass
    assert 0 <= err < total
    reported = {}
    for r in got:
        assert r["err_bound"] == err
        reported[r["token"]] = r["est_count"]
    for tok, est in reported.items():
        true = exact[tok]
        assert est <= true <= est + err, (tok, est, true, err)
    # any key with true frequency > err is guaranteed reported
    for tok, true in exact.items():
        if true > err:
            assert tok in reported, (tok, true, err)


def test_bounded_k_respects_k_per_partition(spark):
    # one partition, k=3, adversarial stream: summary size stays <= k
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20 + [
        (t,) for t in "defghijklmnop"
    ]
    tokens = spark.createDataFrame(rows, ["token"]).coalesce(1)
    got = misra_gries_topk(tokens, 3, topk=100).collect()
    assert 0 < len(got) <= 3
    exact = _exact_counts(tokens)
    err = got[0]["err_bound"]
    for r in got:
        assert r["est_count"] <= exact[r["token"]] <= r["est_count"] + err
    # the two dominant keys survive any MG(3) run over this stream
    toks = {r["token"] for r in got}
    assert {"a", "b"} <= toks
