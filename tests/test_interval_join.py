"""Unit pins for interval_join_bucketed (operators/asof.py).

The gated attribution query hash-matches DuckDB's theta join; these
tests pin grain-bucketing correctness against a naive nested-loop
reference on fixtures engineered to hit the edges: points exactly at
interval start (inclusive) and end (exclusive), intervals crossing
grain boundaries, intervals LONGER than the grain (3+ grain explode),
and key isolation (same times, different keys never match).
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from fastetl_spark.operators.asof import interval_join_bucketed


def _run(spark, pts, ivals, grain):
    p = spark.createDataFrame(pts, "pid bigint, k bigint, t bigint")
    i = spark.createDataFrame(ivals, "iid bigint, k bigint, s bigint, e bigint")
    got = interval_join_bucketed(
        p, i, on=["k"], point_us="t", start_us="s", end_us="e", grain_us=grain
    )
    want = sorted(
        (pp, ii)
        for (pp, kk, tt), (ii, ki, ss, ee) in itertools.product(pts, ivals)
        if kk == ki and ss <= tt < ee
    )
    assert sorted((r["pid"], r["iid"]) for r in got.collect()) == want
    return want


def test_boundaries_and_grain_crossing(spark):
    grain = 100
    ivals = [
        (1, 1, 50, 150),   # crosses the grain boundary at 100
        (2, 1, 100, 200),  # aligned exactly to a grain
        (3, 2, 0, 100),    # different key, same times as key-1 points
    ]
    pts = [
        (10, 1, 50),   # == start of iid 1 -> match (inclusive)
        (11, 1, 149),  # just inside iid 1
        (12, 1, 150),  # == end of iid 1 -> NO match there, inside iid 2
        (13, 1, 99),   # inside iid 1 only
        (14, 1, 200),  # == end of iid 2 -> no match
        (15, 2, 50),   # key 2: matches iid 3 only
    ]
    want = _run(spark, pts, ivals, grain)
    assert want == [(10, 1), (11, 1), (11, 2), (12, 2), (13, 1), (15, 3)]


def test_interval_longer_than_grain(spark):
    # interval spans 5 grains: every covered grain must match, and the
    # exact filter must kill the partial first/last grains correctly
    ivals = [(1, 7, 130, 570)]
    pts = [(i, 7, v) for i, v in enumerate((100, 130, 299, 300, 569, 570, 600))]
    want = _run(spark, pts, ivals, grain=100)
    assert want == [(1, 1), (2, 1), (3, 1), (4, 1)]


def test_no_duplicate_pairs_on_multi_grain_intervals(spark):
    # a point inside a long interval matches exactly once even though
    # the interval exploded into many grains
    p = spark.createDataFrame([(1, 1, 250)], "pid bigint, k bigint, t bigint")
    i = spark.createDataFrame([(9, 1, 0, 1000)], "iid bigint, k bigint, s bigint, e bigint")
    out = interval_join_bucketed(
        p, i, on=["k"], point_us="t", start_us="s", end_us="e", grain_us=100
    )
    assert out.count() == 1


def test_negative_timestamps_floor_semantics(spark):
    # pre-epoch style negatives: floor-div bucketing (via pmod) must
    # keep pair-exactness when coordinates are negative
    ivals = [(1, 1, -150, -50)]
    pts = [(1, 1, -150), (2, 1, -101), (3, 1, -100), (4, 1, -51), (5, 1, -50)]
    want = _run(spark, pts, ivals, grain=100)
    assert want == [(1, 1), (2, 1), (3, 1), (4, 1)]
