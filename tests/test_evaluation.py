"""Hand-computed checks for the evaluation operators (the differential
suite in test_queries_vs_duckdb covers the full-table oracle gate; these
pin the statistics themselves on tiny frames with known answers)."""

from __future__ import annotations

from fastetl_spark.operators.evaluation import auc_by_class


def test_auc_matches_hand_computed_pairs(spark):
    # pos scores {3, 5}, neg scores {1, 3}:
    #   pairs: (3>1) win, (3==3) tie, (5>1) win, (5>3) win
    #   auc = (2*3 + 1) / (2*2*2) = 7/8
    df = spark.createDataFrame(
        [("p", 3.0), ("p", 5.0), ("n", 1.0), ("n", 3.0)],
        "cls string, score double",
    )
    rows = {r["cls"]: r for r in auc_by_class(df, "cls", "score").collect()}
    assert rows["p"]["n_pos"] == 2 and rows["p"]["n_neg"] == 2
    assert rows["p"]["auc"] == 7 / 8
    # one-vs-rest symmetry: AUC(n) = 1 - AUC(p) with the tie halved
    assert rows["n"]["auc"] == 1 - 7 / 8


def test_auc_all_ties_is_half(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 2.0), ("b", 2.0)], "cls string, score double"
    )
    rows = {r["cls"]: r for r in auc_by_class(df, "cls", "score").collect()}
    assert rows["a"]["auc"] == 0.5
    assert rows["b"]["auc"] == 0.5


def test_auc_perfect_separation(spark):
    df = spark.createDataFrame(
        [("hi", 10.0), ("hi", 9.0), ("lo", 1.0), ("lo", 2.0)],
        "cls string, score double",
    )
    rows = {r["cls"]: r for r in auc_by_class(df, "cls", "score").collect()}
    assert rows["hi"]["auc"] == 1.0
    assert rows["lo"]["auc"] == 0.0
