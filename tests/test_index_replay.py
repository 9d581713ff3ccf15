"""Replay-idempotent index appends (round-5): re-running an append of
the SAME increment — the retry after a crashed append job — must be a
no-op, so duplicated band/shingle/code rows can never inflate `shared`
counts or Jaccard in the match paths."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastetl_spark.io.readers import read_table


def _docs(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 7 == 0), d.filter(F.col("doc_id") % 7 != 0)


def test_shingle_append_replay_is_noop(spark, sf_dir, tmp_path):
    from fastetl_spark.operators.dedup_index import (
        append_to_shingle_index,
        build_shingle_index,
        match_against_index,
    )

    inc, corpus = _docs(spark, sf_dir)
    idx = str(tmp_path / "idx")
    build_shingle_index(corpus, idx, n_buckets=8)
    append_to_shingle_index(inc, idx)
    once = sorted(map(tuple, match_against_index(spark, idx, inc).collect()))
    n_rows_once = spark.read.parquet(idx).count()
    # the retry: identical increment, same index
    append_to_shingle_index(inc, idx)
    again = sorted(map(tuple, match_against_index(spark, idx, inc).collect()))
    assert spark.read.parquet(idx).count() == n_rows_once  # no new rows
    assert again == once  # byte-identical match results
    # a genuinely NEW increment still appends
    shifted = inc.withColumn("doc_id", F.col("doc_id") + 500_000)
    append_to_shingle_index(shifted, idx)
    assert spark.read.parquet(idx).count() > n_rows_once


def test_minhash_append_replay_is_noop(spark, sf_dir, tmp_path):
    from fastetl_spark.operators.dedup_index import (
        append_to_minhash_index,
        build_minhash_index,
    )

    inc, corpus = _docs(spark, sf_dir)
    idx = str(tmp_path / "idx")
    build_minhash_index(corpus, idx, n_buckets=8)
    append_to_minhash_index(inc, idx)
    n_once = spark.read.parquet(idx).count()
    append_to_minhash_index(inc, idx)
    assert spark.read.parquet(idx).count() == n_once


def test_ivf_append_replay_is_noop(spark, sf_dir, tmp_path):
    from fastetl_spark.operators.ann_index import (
        append_to_ivf_index,
        build_ivf_index,
        search_ivf_index,
    )

    e = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivf")
    build_ivf_index(e.filter(F.col("vec_id") < 200), idx, "vec_id", "embedding")
    inc = e.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 220))
    append_to_ivf_index(inc, idx)
    n_once = spark.read.parquet(idx).count()
    once = sorted(
        map(tuple, search_ivf_index(spark, idx, inc, k=3, nprobe=4).collect())
    )
    append_to_ivf_index(inc, idx)  # the retry
    assert spark.read.parquet(idx).count() == n_once
    again = sorted(
        map(tuple, search_ivf_index(spark, idx, inc, k=3, nprobe=4).collect())
    )
    assert again == once


def test_ivfpq_append_replays_only_missing_half(spark, sf_dir, tmp_path):
    """Per-half markers: when the codes half of a previous attempt
    committed but the vectors half crashed, the retry must append ONLY
    the vectors half."""
    from fastetl_spark.operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
    )
    from fastetl_spark.operators.dedup_index import (
        increment_fingerprint,
        mark_increment_applied,
    )

    e = read_table(spark, sf_dir, "embeddings")
    idx = str(tmp_path / "ivfpq")
    build_ivfpq_index(
        e.filter(F.col("vec_id") < 200), idx, "vec_id", "embedding", vec_buckets=4
    )
    inc = e.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 210))

    # full double-append is a no-op
    append_to_ivfpq_index(inc, idx)
    codes_once = spark.read.parquet(f"{idx}/codes").count()
    vecs_once = spark.read.parquet(f"{idx}/vectors").count()
    append_to_ivfpq_index(inc, idx)
    assert spark.read.parquet(f"{idx}/codes").count() == codes_once
    assert spark.read.parquet(f"{idx}/vectors").count() == vecs_once

    # simulate the half-committed crash for a NEW increment: pre-mark
    # the codes half as applied, then run the append — only vectors grow
    inc2 = e.filter((F.col("vec_id") >= 210) & (F.col("vec_id") < 215))
    fp2 = increment_fingerprint(inc2)
    mark_increment_applied(spark, f"{idx}/codes", fp2)
    append_to_ivfpq_index(inc2, idx)
    assert spark.read.parquet(f"{idx}/codes").count() == codes_once
    assert spark.read.parquet(f"{idx}/vectors").count() == vecs_once + 5


def test_fingerprint_is_order_free_and_content_sensitive(spark):
    from fastetl_spark.operators.dedup_index import increment_fingerprint

    a = spark.createDataFrame([(3,), (1,), (2,)], "doc_id long")
    b = spark.createDataFrame([(1,), (2,), (3,)], "doc_id long")
    c = spark.createDataFrame([(1,), (2,), (4,)], "doc_id long")
    assert increment_fingerprint(a) == increment_fingerprint(b)
    assert increment_fingerprint(a) != increment_fingerprint(c)
