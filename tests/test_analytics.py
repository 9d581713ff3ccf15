"""Behavior tests for the analytics operators (the three oracle-backed
queries are additionally swept by test_queries_vs_duckdb.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.operators.analytics import (
    _KMEANS_K,
    embedding_kmeans_clusters,
    event_value_histogram,
    robust_outlier_events,
    source_reputation_report,
)


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    n_vecs = read_table(spark, sf_dir, "embeddings").count()
    rows = embedding_kmeans_clusters(spark, sf_dir).collect()
    assert 1 <= len(rows) <= _KMEANS_K
    # every vector lands in exactly one cluster
    assert sum(r.n_members for r in rows) == n_vecs
    # cosine of a member to its own centroid is bounded
    assert all(-1.000001 <= r.mean_sim <= 1.000001 for r in rows)


def test_kmeans_deterministic(spark, sf_dir):
    a = sorted(map(tuple, embedding_kmeans_clusters(spark, sf_dir).collect()))
    b = sorted(map(tuple, embedding_kmeans_clusters(spark, sf_dir).collect()))
    assert a == b


def test_source_report_totals(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    rows = source_reputation_report(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    assert all(r.dup_docs >= 0 and r.short_docs <= r.n_docs for r in rows)


def test_outlier_counts_bounded(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    rows = robust_outlier_events(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == e.count()
    # MAD-based outliers are a minority by construction
    assert all(r.n_outliers < r.n for r in rows)
    assert all(r.mad >= 0.0 for r in rows)


def test_histogram_partitions_values(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    h = event_value_histogram(spark, sf_dir)
    assert h.agg(F.sum("n")).first()[0] == e.count()
    bad = h.filter(
        (F.col("min_v") < F.col("bucket") * 10.0)
        | (F.col("max_v") >= (F.col("bucket") + 1) * 10.0)
    )
    assert bad.count() == 0
