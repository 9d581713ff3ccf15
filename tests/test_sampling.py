"""Sampling/splitting/packing: determinism-by-construction guarantees
that sample()/randomSplit() do not provide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.operators.sampling import (
    deterministic_split,
    hash_bucket,
    pack_context_windows,
    sample_by_rates,
)


def test_split_stable_under_repartition(spark, sf_dir):
    """The same doc must land in the same split regardless of data
    layout — the property that makes dataset versions reproducible."""
    base = {r.doc_id: r.split for r in deterministic_split(spark, sf_dir).collect()}
    d = read_table(spark, sf_dir, "documents").repartition(13, "lang")
    b = hash_bucket("doc_id")
    again = {
        r.doc_id: r.split
        for r in d.select(
            "doc_id",
            F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
        ).collect()
    }
    assert base == again
    # rough proportions hold (multiplicative hash is uniform)
    n = len(base)
    train = sum(1 for s in base.values() if s == "train")
    assert 0.7 < train / n < 0.9


def test_split_is_exhaustive_and_disjoint(spark, sf_dir):
    out = deterministic_split(spark, sf_dir)
    total = read_table(spark, sf_dir, "documents").count()
    assert out.count() == total
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0


def test_sample_by_rates_general_form(spark):
    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    kept = sample_by_rates(df, "doc_id", F.lit(30)).count()
    assert 0.25 < kept / 10_000 < 0.35  # ~30%
    # idempotent: same rows every time
    assert kept == sample_by_rates(df, "doc_id", F.lit(30)).count()


def test_pack_context_windows_invariants(spark, sf_dir):
    """Every doc's offset lies inside the budget, packs are contiguous
    per stratum, and a doc never moves between runs."""
    out = pack_context_windows(spark, sf_dir).collect()
    assert all(0 <= r.pack_offset < 2048 for r in out)
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.pack_id)
    for packs in by_lang.values():
        ids = sorted(set(packs))
        assert ids == list(range(ids[-1] + 1))  # contiguous pack ids


def test_export_training_shards_layout(spark, sf_dir, tmp_path):
    """Partition dirs per split, bounded file sizes, rows ordered within
    each shard — the layout contract a trainer relies on."""
    import os

    from fastetl_spark.io.writers import export_training_shards
    from fastetl_spark.operators.sampling import deterministic_split
    from fastetl_spark.io.readers import read_table

    d = read_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    split = deterministic_split(spark, sf_dir).select("doc_id", "split")
    df = d.join(split, "doc_id")
    out = str(tmp_path / "shards")
    export_training_shards(
        df, out, partition_by=["split"], order_by=["doc_id"],
        shards_per_partition=4, max_records_per_file=100,
    )
    dirs = sorted(p for p in os.listdir(out) if p.startswith("split="))
    assert dirs == ["split=test", "split=train", "split=val"]
    back = spark.read.parquet(out)
    assert back.count() == df.count()
    # partition pruning: reading one split scans only that directory
    one = spark.read.parquet(out).filter(F.col("split") == "train")
    assert one.count() == df.filter(split.split == "train").count()
    # within-file ordering: each parquet file's doc_ids are sorted
    import pyarrow.parquet as pq

    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                ids = pq.read_table(os.path.join(root, f), columns=["doc_id"])["doc_id"].to_pylist()
                assert ids == sorted(ids)
                assert len(ids) <= 100
