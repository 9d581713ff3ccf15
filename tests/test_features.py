"""Semantic checks for the feature-engineering operators (features.py)
beyond the differential hash gate."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastetl_spark.operators.features import (
    _CHUNK_STRIDE,
    _CHUNK_W,
    doc_chunk_overlap,
    decayed_user_scores,
    mixture_temperature_weights,
    value_decile_bins,
)

SF = "/root/testdata/sf0.001"


def test_chunks_cover_text_with_overlap(spark):
    out = doc_chunk_overlap(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    joined = out.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.max(F.col("start") + F.col("chunk_len") - 1).alias("covered"),
        F.min("chunk_len").alias("min_len"),
    ).join(docs.select("doc_id", F.length("text").alias("n")), "doc_id")
    rows = joined.collect()
    assert rows
    for r in rows:
        # last chunk reaches the end of the text; every chunk is non-empty
        # and at most the window width; chunk count matches the stride walk
        assert r.covered == r.n
        assert 0 < r.min_len <= _CHUNK_W
        assert r.n_chunks == (max(r.n - 1, 0) // _CHUNK_STRIDE) + 1


def test_decile_bins_partition_each_type(spark):
    out = value_decile_bins(spark, SF)
    agg = out.groupBy("event_type").agg(
        F.sum("n").alias("total"),
        F.count(F.lit(1)).alias("nbins"),
        F.min("bin").alias("lo"),
        F.max("bin").alias("hi"),
    )
    ev_counts = {
        r.event_type: r["count"]
        for r in spark.read.parquet(f"{SF}/events.parquet").groupBy("event_type").count().collect()
    }
    for r in agg.collect():
        assert r.total == ev_counts[r.event_type]
        assert (r.nbins, r.lo, r.hi) == (10, 1, 10)
    # bins are contiguous, non-overlapping value ranges
    for r in out.orderBy("event_type", "bin").collect():
        assert r.min_v <= r.max_v


def test_mixture_shares_sum_to_one(spark):
    rows = mixture_temperature_weights(spark, SF).collect()
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
    # temperature flattens: share spread is narrower than token spread
    toks = [r.tokens for r in rows]
    shares = [r.share for r in rows]
    assert max(shares) / min(shares) <= max(toks) / min(toks)


def test_decayed_scores_bounded_by_undecayed(spark):
    out = decayed_user_scores(spark, SF)
    ev = spark.read.parquet(f"{SF}/events.parquet").filter(F.col("value") >= 0)
    raw = ev.groupBy("user_id").agg(F.sum(F.floor(F.col("value") * 1_000_000)).alias("raw"))
    j = out.join(raw, "user_id").collect()
    assert j
    assert all(r.decayed_score <= r.raw for r in j)


def test_engine_chunk_and_semantic_dedup_facades(spark):
    from fastetl_spark.api import Engine

    eng = Engine(spark)
    docs = spark.createDataFrame(
        [(1, "en", "x" * 400), (2, "pt", "y" * 100)], "doc_id long, lang string, text string"
    )
    out = eng.chunk(docs, width=200, stride=150)
    assert set(out.columns) == {"doc_id", "lang", "chunk_idx", "start", "chunk"}
    per = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {1: 3, 2: 1}  # 400 chars -> starts 1,151,301; 100 -> 1

    vecs = spark.read.parquet(f"{SF}/embeddings.parquet")
    sd = eng.semantic_dedup(vecs, "vec_id", "embedding")
    assert sd.count() == vecs.count()
