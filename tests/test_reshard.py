"""Rendezvous shard layer over the v2 bucketed store (io/bucketed):
the stable-resharding claims, measured.

- growing n -> n+1 moves ~1/(n+1) of buckets AND rows, and every moved
  bucket lands on the NEW shard (HRW never reorders survivors);
- content is identical before/after a reshard (also hash-gated by the
  rendezvous_reshard_roundtrip query);
- shards partition the store: read_shard frames are disjoint and union
  to the full content;
- resharding to the same count is a no-op; unmoved bucket files
  survive byte-identical (same paths, same mtimes);
- the placement map survives a partial_merge and a rollback;
- the driver-side HRW (_hrw_shard) agrees with the row-level
  rendezvous_shard column expression for identical string keys.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fastetl_spark.io.bucketed import (
    _hrw_shard,
    list_generations,
    partial_merge,
    read_bucket_spec,
    read_bucketed,
    read_manifest,
    read_shard,
    reshard_bucketed,
    rollback_bucketed,
    shard_map,
    write_bucketed,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def store(spark, tmp_path):
    """256-bucket, 4-shard store over 4096 synthetic keyed rows."""
    path = str(tmp_path / "sharded_store")
    df = spark.range(4096).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    write_bucketed(df, path, ["k"], 256, atomic=True, n_shards=4)
    return path


@pytest.mark.slow  # full gate only (with the 3 siblings below): reshard correctness runs in the default profile via the rendezvous_reshard_roundtrip oracle gate + the cheap hrw/validation tests at the bottom of this file
def test_grow_moves_about_one_nth(spark, store):
    before = _rows(read_bucketed(spark, store))
    stats = reshard_bucketed(spark, store, 5)
    assert stats["old_n_shards"] == 4 and stats["new_n_shards"] == 5
    # expected moved fraction is 1/5 of 256 buckets = ~51; binomial
    # 3-sigma band is ~±19 — the band also excludes the two failure
    # modes (modulo-style ~4/5 moved, or 0 moved)
    assert 25 <= stats["buckets_moved"] <= 80, stats
    frac = stats["rows_moved"] / stats["rows_total"]
    assert 0.08 <= frac <= 0.33, stats
    # HRW grow property: every moved bucket lands on the NEW shard
    new_map = shard_map(spark, store)
    old_map = {b: _hrw_shard(b, 4) for b in range(256)}
    moved = [b for b in new_map if new_map[b] != old_map[b]]
    assert len(moved) == stats["buckets_moved"]
    assert all(new_map[b] == 4 for b in moved)
    # content identity
    assert _rows(read_bucketed(spark, store)) == before


@pytest.mark.slow  # full gate only: see test_grow_moves_about_one_nth
def test_shards_partition_the_store(spark, store):
    reshard_bucketed(spark, store, 5)
    full = _rows(read_bucketed(spark, store))
    parts = [read_shard(spark, store, s) for s in range(5)]
    keys_per_shard = [set(r[0] for r in p.collect()) for p in parts]
    # disjoint
    for i in range(5):
        for j in range(i + 1, 5):
            assert not (keys_per_shard[i] & keys_per_shard[j])
    # union = everything
    assert sorted(t for p in parts for t in _rows(p)) == full


@pytest.mark.slow  # full gate only: see test_grow_moves_about_one_nth
def test_same_count_is_noop_and_unmoved_files_survive(spark, store):
    base = store.rstrip("/")
    m = read_manifest(spark, store)
    mtimes = {}
    for d in m["buckets"].values():
        full = os.path.join(base, d)
        mtimes[d] = {f: os.path.getmtime(os.path.join(full, f))
                     for f in os.listdir(full) if not f.startswith(".")}
    stats = reshard_bucketed(spark, store, 4)
    assert stats["buckets_moved"] == 0 and stats["rows_moved"] == 0
    stats = reshard_bucketed(spark, store, 5)
    # unmoved buckets: same dirs referenced, files byte-untouched
    m2 = read_manifest(spark, store)
    new_map, old_map = shard_map(spark, store), {
        b: _hrw_shard(b, 4) for b in range(256)
    }
    unmoved = [b for b in m2["buckets"] if new_map[b] == old_map[b]]
    assert unmoved
    for b in unmoved:
        d = m2["buckets"][b]
        full = os.path.join(base, d)
        assert {
            f: os.path.getmtime(os.path.join(full, f))
            for f in os.listdir(full)
            if not f.startswith(".")
        } == mtimes[d]


@pytest.mark.slow  # full gate only: see test_grow_moves_about_one_nth
def test_placement_survives_merge_and_rollback(spark, store):
    reshard_bucketed(spark, store, 5)
    placed = shard_map(spark, store)
    inc = spark.range(100).select(
        (F.col("id") + 10_000).alias("k"), F.lit(1).cast("long").alias("v")
    )
    partial_merge(spark, store, inc)
    assert shard_map(spark, store) == placed
    assert read_bucketed(spark, store).count() == 4096 + 100
    gen = rollback_bucketed(spark, store)
    assert gen == max(list_generations(spark, store))
    assert shard_map(spark, store) == placed
    assert read_bucketed(spark, store).count() == 4096


def test_initializes_unsharded_store_without_moving(spark, tmp_path):
    path = str(tmp_path / "plain_v2")
    df = spark.range(500).select(F.col("id").alias("k"), F.lit(0).alias("v"))
    write_bucketed(df, path, ["k"], 32, atomic=True)
    stats = reshard_bucketed(spark, path, 3)
    assert stats["old_n_shards"] == 0 and stats["buckets_moved"] == 0
    assert read_bucket_spec(spark, path)["n_shards"] == 3
    assert set(shard_map(spark, path).values()) <= {0, 1, 2}
    assert read_bucketed(spark, path).count() == 500


def test_hrw_matches_rendezvous_shard_column(spark):
    from fastetl_spark.operators.partitioning import rendezvous_shard

    keys = [str(b) for b in range(128)]
    df = spark.createDataFrame([(k,) for k in keys], ["key"])
    for n in (4, 5, 9):
        got = {
            r["key"]: r["s"]
            for r in df.select(
                "key", rendezvous_shard(F.col("key"), n).alias("s")
            ).collect()
        }
        assert got == {k: _hrw_shard(int(k), n) for k in keys}


def test_sharded_requires_atomic_layout(spark, tmp_path):
    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="atomic"):
        write_bucketed(df, str(tmp_path / "x"), ["k"], 4, n_shards=2)
    write_bucketed(df, str(tmp_path / "y"), ["k"], 4)  # v1
    with pytest.raises(ValueError, match="v2|atomic"):
        reshard_bucketed(spark, str(tmp_path / "y"), 2)


def test_hrw_stability_property():
    """HRW invariants at arbitrary shard counts (pure driver-side
    property — no Spark): growing n -> n+1 only ever moves keys TO the
    new shard, shrinking is the exact inverse, and the moved fraction
    concentrates near 1/(n+1)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(st.integers(min_value=1, max_value=12))
    def check(n):
        keys = range(400)
        old = {k: _hrw_shard(k, n) for k in keys}
        new = {k: _hrw_shard(k, n + 1) for k in keys}
        moved = [k for k in keys if old[k] != new[k]]
        assert all(new[k] == n for k in moved)  # only to the NEW shard
        frac = len(moved) / len(old)
        # binomial(400, 1/(n+1)) stays inside a generous 4-sigma band
        import math

        p = 1 / (n + 1)
        sigma = math.sqrt(p * (1 - p) / 400)
        assert abs(frac - p) < 4 * sigma + 0.01, (n, frac, p)

    check()
