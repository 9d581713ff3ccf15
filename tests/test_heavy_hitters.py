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


def _mg_envelope_holds(got, exact):
    err = got[0]["err_bound"]
    assert all(r["err_bound"] == err for r in got)
    for r in got:
        assert r["est_count"] <= exact[r["token"]] <= r["est_count"] + err, (
            r["token"], r["est_count"], exact[r["token"]], err,
        )
    for tok, true in exact.items():
        if true > err:
            assert tok in {r["token"] for r in got}, (tok, true, err)


def _skew_layouts(spark):
    """Two adversarial partition layouts over the SAME multiset:
    (a) every heavy key colocated in ONE partition, noise elsewhere;
    (b) the heavy keys' occurrences spread evenly across ALL partitions.
    union() of coalesce(1) frames preserves each input as one partition,
    so the layouts are deterministic, not hash-accidental."""
    heavy = [("a",)] * 500 + [("b",)] * 300 + [("c",)] * 200
    noise = [(f"n{i}_{j}",) for i in range(3) for j in range(120)]

    def layout(parts):
        # one list element per partition, flattened inside the partition
        # — union/createDataFrame would fold local relations together
        rdd = spark.sparkContext.parallelize(parts, len(parts)).flatMap(
            lambda rows: rows
        )
        return spark.createDataFrame(rdd, "token string")

    colocated = layout(
        [heavy] + [noise[i * 120:(i + 1) * 120] for i in range(3)]
    )
    spread = layout(
        [
            [("a",)] * 125 + [("b",)] * 75 + [("c",)] * 50
            + noise[i * 90:(i + 1) * 90]
            for i in range(4)
        ]
    )
    return {"colocated": colocated, "spread": spread}


def test_skewed_partitioning_stress(spark):
    """The est <= true <= est + err envelope and the exhaustive-twin
    equivalence must hold under BOTH adversarial layouts — all heavy
    keys in one partition, and heavy keys striped 1-per-partition."""
    for name, tokens in _skew_layouts(spark).items():
        assert tokens.rdd.getNumPartitions() == 4, name
        exact = _exact_counts(tokens)
        got = misra_gries_topk(tokens, _HH_PRODUCTION_K, topk=100_000).collect()
        assert got, name
        _mg_envelope_holds(got, exact)
        # the dominant keys are far above any possible decrement mass
        toks = {r["token"] for r in got}
        assert {"a", "b", "c"} <= toks, (name, toks)
        # exhaustive twin: k > vocabulary => exact counts in any layout
        exh = misra_gries_topk(tokens, 100_000, topk=100_000).collect()
        assert {r["token"]: r["est_count"] for r in exh} == exact, name
        assert all(r["err_bound"] == 0 for r in exh), name
