"""Persistent shingle index: SUBLINEAR incremental corpus dedup.

`incremental_jaccard_matches` (operators/dedup) is O(|increment|) in
pair work but still SCANS the whole corpus to shingle it — at 100 TB
that scan dominates every daily batch. This module removes it: the
corpus's exploded (shingle, doc_id, n_sh) rows are persisted ONCE as a
shingle-bucketed destination (io/bucketed layout, keys=[shingle]), and
then

- **matching** an increment reads ONLY the buckets containing the
  increment's shingles (`read_buckets_for_keys` — hash-prune, then
  exact semi-join), so a daily batch against a 100 TB corpus touches
  GBs, not the corpus;
- **maintenance** appends the increment's own shingle rows as new
  parquet files INTO the touched bucket directories — no bucket
  rewrite at all, O(|increment|) writes (run io/writers
  compact_parquet_dir-style compaction per bucket when file counts
  creep).

The index stores n_sh (the doc's distinct-shingle count) beside every
row, so exact Jaccard needs no lookup back into the corpus. The df-cap
(stopword-shingle skew guard, same rationale as ngram_jaccard_pairs)
is applied at match time over the read buckets: counts there EQUAL
global counts for the shingles under test, because a shingle's rows
all hash to the same bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.bucketed import (
    BUCKET_COL,
    bucket_id,
    read_bucket_spec,
    read_buckets_for_keys,
    write_bucketed,
)
from fastetl_spark.operators.dedup import (
    _JACCARD_DF_CAP,
    _JACCARD_THRESHOLD,
    _SHINGLE_N,
    shingle_hashes,
    word_tokens,
)

INDEX_BUCKETS = 64  # local default; size ~4096 for a 100 TB corpus


def _shingle_rows(docs: DataFrame, shingle_n: int) -> DataFrame:
    """(shingle, doc_id, n_sh) rows for a (doc_id, text) frame."""
    tok = docs.select("doc_id", word_tokens(F.col("text")).alias("tokens"))
    sh = tok.select(
        "doc_id", shingle_hashes(F.col("tokens"), shingle_n).alias("shingles")
    )
    return (
        sh.select(
            "doc_id",
            F.size("shingles").alias("n_sh"),
            F.explode_outer("shingles").alias("shingle"),
        )
        .filter(F.col("shingle").isNotNull())
        .select("shingle", "doc_id", "n_sh")
    )


def build_shingle_index(
    docs: DataFrame,
    index_path: str,
    n_buckets: int = INDEX_BUCKETS,
    shingle_n: int = _SHINGLE_N,
) -> None:
    """One-time index build: explode the corpus once and lay the rows
    out bucketed by shingle hash."""
    write_bucketed(_shingle_rows(docs, shingle_n), index_path, ["shingle"], n_buckets)


def append_to_shingle_index(docs: DataFrame, index_path: str) -> None:
    """O(|increment|) maintenance: the new docs' shingle rows land as
    appended files inside the buckets they hash to — nothing is
    rewritten. Call AFTER matching (or the increment matches itself)."""
    spark = docs.sparkSession
    spec = read_bucket_spec(spark, index_path)
    if spec is None:
        raise ValueError(f"{index_path} is not a shingle index (no bucket spec)")
    rows = _shingle_rows(docs, _SHINGLE_N)
    (
        rows.withColumn(BUCKET_COL, bucket_id(["shingle"], spec["n_buckets"]))
        .write.mode("append")
        .partitionBy(BUCKET_COL)
        .parquet(index_path)
    )


def match_against_index(
    spark: SparkSession,
    index_path: str,
    increment: DataFrame,
    threshold: float = _JACCARD_THRESHOLD,
    df_cap: int | None = _JACCARD_DF_CAP,
    shingle_n: int = _SHINGLE_N,
) -> DataFrame:
    """Near-dup matches (new_doc, corpus_doc, shared, jaccard) of an
    increment against the indexed corpus, reading ONLY the index
    buckets the increment's shingles hash to."""
    ex_i = _shingle_rows(increment, shingle_n).select(
        F.col("shingle"),
        F.col("doc_id").alias("new_doc"),
        F.col("n_sh").alias("n_i"),
    ).transform(materialize)
    inc_shingles = ex_i.select("shingle").distinct()
    # hash-prune to touched buckets, exact semi-join inside them
    hits = read_buckets_for_keys(spark, index_path, inc_shingles).select(
        F.col("shingle"),
        F.col("doc_id").alias("corpus_doc"),
        F.col("n_sh").alias("n_c"),
    )
    if df_cap is not None:
        # bucket-local df == global df for these shingles (all rows of a
        # shingle share its bucket), so the cap is exact
        survivors = (
            hits.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= df_cap)
            .select("shingle")
        )
        hits = hits.join(survivors, on="shingle", how="left_semi")
    pairs = (
        hits.join(ex_i, on="shingle")
        .groupBy("new_doc", "corpus_doc")
        .agg(
            F.max("n_c").alias("n_c"),
            F.max("n_i").alias("n_i"),
            F.count(F.lit(1)).alias("shared"),
        )
    )
    jac = F.col("shared") * 1.0 / (F.col("n_c") + F.col("n_i") - F.col("shared"))
    return pairs.select(
        "new_doc", "corpus_doc", "shared", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)
