"""Hand-computed checks for the distributed exact order statistics
(the differential suite covers the full-table oracle gate)."""

from __future__ import annotations

from fastetl_spark.operators.rank_quantiles import (
    exact_quantiles_by_key,
    exact_quantiles_global,
    iqr_outlier_counts,
)


def _vals(spark, xs, key="k"):
    return spark.createDataFrame(
        [(key, float(x)) for x in xs], "k string, v double"
    )


def test_global_disc_selection_hand_computed(spark):
    # 1..10: k = ceil(p*n): median k=5 -> 5.0, q1 k=3 -> 3.0, p99 k=10
    df = _vals(spark, range(1, 11))
    got = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_global(
            df, "v", probs=[(1, 4), (1, 2), (99, 100)]
        ).collect()
    }
    assert got == {(1, 4): 3.0, (1, 2): 5.0, (99, 100): 10.0}


def test_tie_mass_counts_once_per_row(spark):
    # [1,1,1,2]: median k=2 falls inside the tie block -> 1.0
    df = _vals(spark, [1, 1, 1, 2])
    got = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_global(df, "v", probs=[(1, 2)]).collect()
    }
    assert got == {(1, 2): 1.0}


def test_by_key_matches_global_on_single_key(spark):
    df = _vals(spark, [5, 1, 9, 3, 7])
    g = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_global(df, "v").collect()
    }
    k = {
        (r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_by_key(df, "k", "v").collect()
    }
    assert g == k


def test_by_key_independent_groups(spark):
    rows = [("a", float(x)) for x in range(1, 5)] + [
        ("b", float(x)) for x in (100, 200, 300)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        (r["k"], r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_by_key(df, "k", "v", probs=[(1, 2)]).collect()
    }
    assert got == {("a", 1, 2): 2.0, ("b", 1, 2): 200.0}


def test_iqr_counts_hand_computed(spark):
    # 1..8 plus outliers -100 and 100: q1 = 8th..  n=10 -> q1 k=3
    xs = [1, 2, 3, 4, 5, 6, 7, 8, -100.0, 100.0]
    df = _vals(spark, xs)
    r = iqr_outlier_counts(df, "k", "v").collect()[0]
    # k1 = ceil(10/4)=3 -> q1=2.0 (3rd smallest incl -100), k3 = ceil(30/4)=8 -> q3=7.0
    assert (r["q1"], r["q3"]) == (2.0, 7.0)
    lo, hi = 2.0 - 1.5 * 5.0, 7.0 + 1.5 * 5.0
    assert r["n_below"] == sum(1 for x in xs if x < lo)
    assert r["n_above"] == sum(1 for x in xs if x > hi)
    assert r["n"] == 10


def test_empty_frame_empty_result(spark):
    df = spark.createDataFrame([], "k string, v double")
    assert exact_quantiles_global(df, "v").count() == 0


def test_no_single_partition_exchange(spark):
    import importlib.util
    import os

    df = _vals(spark, range(100))
    got = exact_quantiles_by_key(df, "k", "v")
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "simple"
    )
    # the only allowed SinglePartition class is a keyless scalar-agg
    # merge; the selection itself must never sort globally — reuse the
    # audit's classifier so test and gate share one definition
    spec = importlib.util.spec_from_file_location(
        "shuffle_audit_mod",
        os.path.join(os.path.dirname(__file__), "..", "tools", "shuffle_audit.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cls = mod.classify_single_parts(plan)
    assert cls["sort"] == 0 and cls["other"] == 0


def test_null_key_is_a_group(spark):
    """A NULL group key is legitimate under SQL GROUP BY.  It survives
    the null-safe offset join inside bucketed_cum_sum; the final n_key
    join must be eqNullSafe too or the NULL group silently emits no
    quantile rows (the r12 ADVICE finding)."""
    rows = [(None, float(x)) for x in (10, 20, 30)] + [
        ("a", float(x)) for x in (1, 2, 3, 4)
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        (r["k"], r["p_num"], r["p_den"]): r["value"]
        for r in exact_quantiles_by_key(df, "k", "v", probs=[(1, 2)]).collect()
    }
    assert got == {(None, 1, 2): 20.0, ("a", 1, 2): 2.0}
