"""IVM algebra: the three-term join delta must equal new-view-minus-
old-view on randomized increments (not just the gated fixture split),
and applying the delta to the old view must reproduce the full rejoin."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fastetl_spark.operators.ivm import distinct_view_delta, join_view_delta


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_join_delta_equals_spec_randomized(spark):
    rng = random.Random(7)
    a = [(i, rng.randrange(20)) for i in range(300)]          # (aid, k)
    b = [(j, rng.randrange(20)) for j in range(60)]           # (bid, k)
    a_new = [r for r in a if rng.random() < 0.3]
    a_old = [r for r in a if r not in a_new]
    b_new = [r for r in b if rng.random() < 0.3]
    b_old = [r for r in b if r not in b_new]

    A0 = _mk(spark, a_old, "aid long, k long")
    dA = _mk(spark, a_new, "aid long, k long")
    B0 = _mk(spark, b_old, "bid long, k long")
    dB = _mk(spark, b_new, "bid long, k long")

    got = sorted(
        (r.aid, r.bid)
        for r in join_view_delta(A0, dA, B0, dB, ["k"]).collect()
    )
    old_v = {(x, y) for x, ka in a_old for y, kb in b_old if ka == kb}
    new_v = {
        (x, y) for x, ka in a_old + a_new for y, kb in b_old + b_new if ka == kb
    }
    assert got == sorted(new_v - old_v)
    # delta terms are disjoint: no pair reported twice
    assert len(got) == len(set(got))


def test_old_view_plus_delta_is_full_rejoin(spark, sf_dir):
    from fastetl_spark.operators.ivm import ivm_join_delta, _ORD_CUTOFF, _CUST_STRIDE
    from fastetl_spark.io.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    full = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
    )
    cutoff = F.lit(_ORD_CUTOFF).cast("timestamp")
    old_v = (
        o.filter(F.col("o_orderdate") < cutoff)
        .join(
            c.filter(F.col("c_custkey") % _CUST_STRIDE != 0),
            o.o_custkey == c.c_custkey,
        )
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment")
    )
    delta = ivm_join_delta(spark, sf_dir).drop("delta_src")
    assert sorted(map(tuple, old_v.unionByName(delta).collect())) == sorted(
        map(tuple, full.collect())
    )


def test_distinct_delta_disjoint_from_view(spark):
    view = _mk(spark, [(1, "a"), (2, "b")], "u long, t string")
    inc = _mk(spark, [(1, "a"), (1, "c"), (3, "b"), (3, "b")], "u long, t string")
    got = sorted(map(tuple, distinct_view_delta(view, inc).collect()))
    assert got == [(1, "c"), (3, "b")]


def test_distinct_delta_null_keys_match_except_semantics(spark):
    # EXCEPT treats NULLs as equal: a (1, NULL) already in the view is
    # NOT new, and a fresh (2, NULL) IS reported once
    view = _mk(spark, [(1, None), (3, "c")], "u long, t string")
    inc = _mk(spark, [(1, None), (2, None), (2, None)], "u long, t string")
    got = sorted(
        ((r.u, r.t) for r in distinct_view_delta(view, inc).collect()),
        key=lambda p: (p[0], p[1] or ""),
    )
    assert got == [(2, None)]
