"""Hand-computed silhouette checks (the oracle gate covers the
embeddings-table instantiation; this pins the moment-identity math)."""

from __future__ import annotations

from fastetl_spark.operators.kmeans import cluster_silhouette


def test_silhouette_hand_computed_1d(spark):
    # cluster 0: x=0 and x=2; cluster 1: x=10 (singleton)
    # squared distances: (0,2)=4, (0,10)=100, (2,10)=64
    df = spark.createDataFrame(
        [(1, [0.0], 0), (2, [2.0], 0), (3, [10.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    rows = {r["vec_id"]: r
            for r in cluster_silhouette(df, scale=1).collect()}
    assert rows[1]["a_dist"] == 4.0 and rows[1]["b_dist"] == 100.0
    assert rows[1]["silhouette"] == (100.0 - 4.0) / 100.0
    assert rows[2]["a_dist"] == 4.0 and rows[2]["b_dist"] == 64.0
    assert rows[2]["silhouette"] == (64.0 - 4.0) / 64.0
    # singleton cluster: conventional s = 0, mean dist to cluster 0 = 82
    assert rows[3]["n_own"] == 1
    assert rows[3]["silhouette"] == 0.0
    assert rows[3]["b_dist"] == (100.0 + 64.0) / 2


def test_silhouette_identical_clusters_is_zero(spark):
    # both clusters sit at the same point: a == b == 0 -> s = 0
    df = spark.createDataFrame(
        [(1, [5.0], 0), (2, [5.0], 0), (3, [5.0], 1), (4, [5.0], 1)],
        "vec_id long, embedding array<double>, label int",
    )
    for r in cluster_silhouette(df, scale=1).collect():
        assert r["silhouette"] == 0.0


def test_silhouette_single_cluster_is_zero_not_minus_one(spark):
    df = spark.createDataFrame(
        [(1, [0.0], 0), (2, [2.0], 0), (3, [9.0], 0)],
        "vec_id long, embedding array<double>, label int",
    )
    for r in cluster_silhouette(df, scale=1).collect():
        assert r["silhouette"] == 0.0
