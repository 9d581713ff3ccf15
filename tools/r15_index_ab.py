#!/usr/bin/env python
"""Interleaved same-session A/B for the r15 index-probe broadcast idea.

OLD = the r14 shapes (plain semi/equi joins whose localCheckpointed
probe side carries no stats); NEW = the working-tree code. Both run in
ONE Spark session, alternating, best-of-N, noop sink — the only
methodology that survives this box's co-tenancy (PERF.md #50/#53).

OUTCOME (r15): with the probe sides broadcast-hinted the A/B measured
0.93x (old 3.538 s vs new 3.793 s best-of-3) — no win — and the hint
is a scale hazard (an increment is not driver-bounded; AQE already
flips these joins to broadcast at runtime from accurate post-shuffle
sizes). The hints were REVERTED; the working tree now matches the r14
shape, so running this tool today measures noise. Kept as the
measurement record for OPTIMIZATION_r15.md item 4.

Usage: python tools/r15_index_ab.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def old_read_buckets_for_keys(spark, path, keys_df):
    """r14 form: no broadcast hint on the key side."""
    from fastetl_spark.io.bucketed import (
        BUCKET_COL,
        SPEC_VERSION_ATOMIC,
        _existing_bucket_paths,
        bucket_id,
        read_bucket_spec,
        read_bucketed,
        read_manifest,
    )

    spec = read_bucket_spec(spark, path)
    keys = spec["keys"]
    tagged = keys_df.withColumn(BUCKET_COL, bucket_id(keys, spec["n_buckets"]))
    touched = sorted(r[0] for r in tagged.select(BUCKET_COL).distinct().collect())
    if spec["version"] == SPEC_VERSION_ATOMIC:
        m = read_manifest(spark, path)
        base = path.rstrip("/")
        dirs = [f"{base}/{m['buckets'][b]}" for b in touched if b in m["buckets"]]
        if not dirs:
            return read_bucketed(spark, path).limit(0)
        dest = spark.read.parquet(*dirs)
        return dest.join(keys_df.select(*keys), on=keys, how="left_semi")
    existing = _existing_bucket_paths(spark, path, touched)
    if not existing:
        return read_bucketed(spark, path).limit(0)
    dest = spark.read.option("basePath", path).parquet(*existing)
    return dest.join(keys_df.select(*keys), on=keys, how="left_semi").drop(BUCKET_COL)


def old_minhash_index_match(spark, sf_dir):
    """r14 match_minhash_index + gated-query wrapper, hint-free."""
    from pyspark.sql import functions as F

    from fastetl_spark.checkpointing import materialize
    from fastetl_spark.io.readers import ensure_parallelism, read_table
    from fastetl_spark.operators.dedup import _INC_SPLIT_MOD
    from fastetl_spark.operators.dedup_index import (
        _JACCARD_THRESHOLD,
        _SHINGLE_N,
        _band_rows,
        _index_is_portable,
        _scratch_index_path,
        shingle_hashes,
        word_tokens,
    )

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    increment = d.filter(F.col("doc_id") % _INC_SPLIT_MOD == 0)
    index_path = _scratch_index_path(sf_dir, "minhash_idx")
    corpus_path = _scratch_index_path(sf_dir, "minhash_corpus")

    portable = _index_is_portable(spark, index_path)
    inc_bands = _band_rows(increment, _SHINGLE_N, portable=portable).select(
        "band", "band_hash", F.col("doc_id").alias("new_doc")
    ).transform(materialize)
    probe_keys = inc_bands.select("band", "band_hash").distinct()
    hits = old_read_buckets_for_keys(spark, index_path, probe_keys).select(
        "band", "band_hash", F.col("doc_id").alias("corpus_doc")
    )
    cands = (
        hits.join(inc_bands, on=["band", "band_hash"])
        .filter(F.col("corpus_doc") != F.col("new_doc"))
        .groupBy("new_doc", "corpus_doc")
        .agg(F.count(F.lit(1)).alias("n_bands"))
    ).transform(materialize)
    wanted = cands.select(F.col("corpus_doc").alias("doc_id")).distinct()
    corpus_docs = old_read_buckets_for_keys(spark, corpus_path, wanted)
    c_sh = corpus_docs.select(
        F.col("doc_id").alias("corpus_doc"),
        shingle_hashes(word_tokens(F.col("text")), _SHINGLE_N).alias("sh_c"),
    )
    i_sh = increment.select(
        F.col("doc_id").alias("new_doc"),
        shingle_hashes(word_tokens(F.col("text")), _SHINGLE_N).alias("sh_i"),
    )
    verified = (
        cands.join(c_sh, on="corpus_doc")
        .join(i_sh, on="new_doc")
        .select(
            "new_doc",
            "corpus_doc",
            F.size(F.array_intersect("sh_i", "sh_c")).alias("shared"),
            F.size("sh_i").alias("n_i"),
            F.size("sh_c").alias("n_c"),
        )
    )
    jac = F.col("shared") * 1.0 / (F.col("n_i") + F.col("n_c") - F.col("shared"))
    return verified.select(
        "new_doc", "corpus_doc", "shared", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= _JACCARD_THRESHOLD)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from fastetl_spark.registry import QUERIES, load_all
    from fastetl_spark.session import get_spark

    load_all()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "r15-index-ab", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    new_fn = QUERIES["minhash_index_match"]
    # warm up both once (index build rides the first call if scratch is
    # cold; codegen/JIT)
    noop(new_fn(spark, SF_DIR))
    noop(old_minhash_index_match(spark, SF_DIR))

    # sanity: identical results
    new_rows = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
    old_rows = sorted(map(tuple, old_minhash_index_match(spark, SF_DIR).collect()))
    assert new_rows == old_rows, "A/B variants disagree!"
    print(f"rows identical: {len(new_rows)} pairs")

    walls = {"old": [], "new": []}
    for _ in range(reps):
        for tag, fn in (
            ("old", old_minhash_index_match),
            ("new", new_fn),
        ):
            spark.sparkContext.setJobDescription(f"minhash_index_match:{tag}")
            t0 = time.perf_counter()
            noop(fn(spark, SF_DIR))
            walls[tag].append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    la1 = round(os.getloadavg()[0], 1)
    o, n = min(walls["old"]), min(walls["new"])
    print(f"old best-of-{reps}: {o:.3f}s  all={[round(t,3) for t in walls['old']]}")
    print(f"new best-of-{reps}: {n:.3f}s  all={[round(t,3) for t in walls['new']]}")
    print(f"speedup {o / n:.2f}x  la1={la1}")
    spark.stop()


if __name__ == "__main__":
    main()
