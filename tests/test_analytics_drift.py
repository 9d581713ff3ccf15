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
