"""Bloom prefilter soundness: membership is NEVER false-negative (a
true match always passes), false positives exist only outside the build
set, and the gated stats query is internally consistent."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.operators.bloomjoin import bloom_prefilter, bloom_semi_join_stats


def test_no_false_negatives_synthetic(spark):
    build = spark.createDataFrame([(i,) for i in range(0, 500, 3)], "k long")
    probe = spark.createDataFrame([(i,) for i in range(500)], "k long")
    tagged = bloom_prefilter(probe, "k", build, "k").collect()
    members = set(range(0, 500, 3))
    misses = [r.k for r in tagged if r.k in members and not r.bloom_pass]
    assert misses == []  # soundness: no member ever filtered out
    # and the filter must actually filter SOMETHING outside the set
    dropped = [r.k for r in tagged if r.k not in members and not r.bloom_pass]
    assert dropped


def test_gated_stats_consistent(spark, sf_dir):
    rows = bloom_semi_join_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_true_match <= r.n_bloom_pass <= r.n_orders
        assert r.n_false_pos == r.n_bloom_pass - r.n_true_match


def test_prefilter_keeps_probe_rowcount(spark, sf_dir):
    from fastetl_spark.io.readers import read_table

    orders = read_table(spark, sf_dir, "orders")
    customers = read_table(spark, sf_dir, "customer").select("c_custkey")
    tagged = bloom_prefilter(orders, "o_custkey", customers, "c_custkey")
    assert tagged.count() == orders.count()  # tagging, not dropping
    assert tagged.filter(~F.col("bloom_pass")).count() == 0  # all custkeys present
