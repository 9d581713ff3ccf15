"""Drift-report behavior the oracle hash can't state on the fixed
fixture: brand-new keys report instead of vanishing; NULLs drop."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.operators.analytics import drift_bins


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, value double, event_id long, us long"
    )


def test_new_key_reports_maximal_drift(spark):
    rows = [("old", float(v % 17), v, 100 + v) for v in range(60)]
    # "fresh" appears only AFTER the midpoint of the combined time range
    rows += [("fresh", float(v), 1000 + v, 200_000 + v) for v in range(20)]
    out = drift_bins(_frame(spark, rows)).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["event_type"], []).append(r)
    assert "fresh" in by_key, "new key must appear in the drift report"
    fresh = {r["bin"]: r for r in by_key["fresh"]}
    assert sum(r["n_ref"] for r in fresh.values()) == 0
    assert fresh[0]["n_cur"] == 20  # all rows in bin 0 vs +inf bounds
    # its bin-0 drift term dominates every term of the stable key
    assert fresh[0]["drift_term"] > max(
        r["drift_term"] for r in by_key["old"]
    )


def test_null_rows_are_not_observations(spark):
    rows = [("a", float(v), v, v) for v in range(40)]
    base = drift_bins(_frame(spark, rows)).collect()
    noisy = rows + [("a", None, 99, 5), ("a", 1.0, 98, None), (None, 1.0, 97, 6)]
    with_nulls = drift_bins(_frame(spark, noisy)).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, with_nulls))


def test_poisson_bootstrap_statistics(spark):
    from fastetl_spark.operators.analytics import poisson_bootstrap_means

    # constant values: every replicate mean is exactly the constant
    const = spark.createDataFrame(
        [("a", i, 700) for i in range(500)], "event_type string, event_id long, qv long"
    )
    out = poisson_bootstrap_means(const, "event_type", "event_id", "qv").collect()
    assert len(out) >= 30  # a rep with zero draws is possible but rare
    assert all(r["boot_mean"] == 7.0 for r in out)
    # n_draws concentrates near n (Poisson(1) per row): mean +- 5 sigma
    import math

    n = 500
    for r in out:
        assert abs(r["n_draws"] - n) < 5 * math.sqrt(n), r

    # linear values: replicate means scatter around the true mean with
    # roughly sqrt(var/n) spread — assert a generous 6-sigma envelope
    lin = spark.createDataFrame(
        [("a", i, i % 100) for i in range(2000)],
        "event_type string, event_id long, qv long",
    )
    means = [
        r["boot_mean"] * 100  # undo the /100 cents convention
        for r in poisson_bootstrap_means(lin, "event_type", "event_id", "qv").collect()
    ]
    true_mean = sum(i % 100 for i in range(2000)) / 2000
    se = math.sqrt(833.25 / 2000)  # var of 0..99 uniform ~ 833.25
    assert all(abs(m - true_mean) < 6 * se for m in means), means
    # and the replicates are not degenerate (actual resampling variance)
    assert max(means) > min(means)
