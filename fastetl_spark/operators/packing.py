"""Sequence packing — the concat-and-chunk layout step of a pretraining
data pipeline.

Training consumes fixed-capacity token sequences, not documents: the
corpus is laid out as one global token stream (documents in id order)
and cut every `capacity` tokens, so most sequences hold several
documents and some documents straddle a cut. This module computes that
layout exactly — for every (document, sequence) intersection a fragment
row (seq_id, start_in_seq, doc_tok_start, frag_len) — which is
precisely the index a pack-and-shard writer needs to emit training
shards without ever concatenating text on one machine.

Determinism: token counts, offsets, and cuts are pure BIGINT
arithmetic, so the gated query hash-matches a DuckDB oracle that states
the same layout with a single global window cumsum.

Scale design — the interesting part is the GLOBAL prefix sum. A naive
`Window.orderBy(doc_id)` with no partition key is a one-task sort (the
classic scale killer); instead the offsets come from a HIERARCHICAL
prefix sum: within-bucket cumulative sums run partitioned by
`doc_id div bucket_span` (parallel), bucket totals collapse to a
buckets-sized frame whose own cumsum is one tiny window, and the bucket
base offsets broadcast-join back. At 1e9 documents with the default
span that second level is ~1e6 rows — one task's worth; add a third
level before that ever matters. The fragment explode fans each doc into
its covered sequences only (1 + len/capacity rows), so output is linear
in total tokens / capacity.

Reference parity: fastETL has no training-layout surface; extension per
SURVEY.md §2.10-2.11 (LLM-data pipeline family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

_PACK_CAPACITY = 256  # tokens per training sequence
_PACK_BUCKET_SPAN = 1024  # docs per prefix-sum bucket (level-1 partition)


def global_token_offsets(
    lens: DataFrame, id_col: str, len_col: str, bucket_span: int = _PACK_BUCKET_SPAN
) -> DataFrame:
    """(id, len) -> (id, len, off): exclusive prefix sum of `len` in id
    order via the two-level hierarchical cumsum described in the module
    docstring. Exact BIGINT arithmetic, identical to a single global
    cumsum — only the execution shape differs."""
    base = lens.select(
        F.col(id_col).alias("__id").cast("long"),
        F.col(len_col).alias("__len").cast("long"),
        (F.col(id_col).cast("long") - F.pmod(F.col(id_col).cast("long"), bucket_span))
        .alias("__bucket"),
    )
    w_in = (
        Window.partitionBy("__bucket")
        .orderBy("__id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = base.withColumn(
        "__off_in", F.coalesce(F.sum("__len").over(w_in), F.lit(0).cast("long"))
    )
    totals = base.groupBy("__bucket").agg(F.sum("__len").alias("__btot"))
    # buckets-sized frame: this single-partition window is over
    # |docs| / bucket_span rows, the whole point of the hierarchy
    w_b = (
        Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)
    )
    boffs = totals.withColumn(
        "__boff", F.coalesce(F.sum("__btot").over(w_b), F.lit(0).cast("long"))
    ).select("__bucket", "__boff")
    return (
        within.join(broadcast(boffs), "__bucket")
        .select(
            F.col("__id").alias(id_col),
            F.col("__len").alias(len_col),
            (F.col("__boff") + F.col("__off_in")).alias("off"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    capacity: int = _PACK_CAPACITY,
    bucket_span: int = _PACK_BUCKET_SPAN,
) -> DataFrame:
    """Concat-and-chunk packing layout: documents in `id_col` order form
    one token stream cut every `capacity` tokens; returns one row per
    (document, sequence) intersection —

    - seq_id: which training sequence the fragment lands in,
    - start_in_seq: offset of the fragment inside that sequence,
    - doc_tok_start: offset of the fragment inside its document,
    - frag_len: fragment token count.

    Every sequence except the last is exactly full by construction; a
    shard writer groups by seq_id and slices each doc's tokens at
    [doc_tok_start, doc_tok_start + frag_len)."""
    lens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tok"),
    )
    offs = global_token_offsets(lens, "doc_id", "n_tok", bucket_span)
    cap = F.lit(int(capacity)).cast("long")
    # integer `div` (not float division + cast): exact at any stream
    # length; offsets are non-negative so truncation == floor
    frags = offs.select(
        "doc_id",
        "n_tok",
        "off",
        F.explode(
            F.sequence(
                F.expr(f"off div {int(capacity)}"),
                F.expr(f"(off + n_tok - 1) div {int(capacity)}"),
            )
        ).alias("seq_id"),
    )
    frag_start = F.greatest(F.col("off"), F.col("seq_id") * cap)
    frag_end = F.least(F.col("off") + F.col("n_tok"), (F.col("seq_id") + 1) * cap)
    return frags.select(
        "doc_id",
        F.col("seq_id").cast("long").alias("seq_id"),
        (frag_start - F.col("seq_id") * cap).cast("long").alias("start_in_seq"),
        (frag_start - F.col("off")).cast("long").alias("doc_tok_start"),
        (frag_end - frag_start).cast("long").alias("frag_len"),
    )


_PACK_SQL = f"""
WITH lens AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents
), offs AS (
  SELECT doc_id, n_tok,
         CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM lens
), frags AS (
  SELECT doc_id, n_tok, off,
         unnest(generate_series(off // {_PACK_CAPACITY},
                                (off + n_tok - 1) // {_PACK_CAPACITY})) AS seq_id
  FROM offs
)
SELECT doc_id,
       CAST(seq_id AS BIGINT) AS seq_id,
       CAST(GREATEST(off, seq_id * {_PACK_CAPACITY})
            - seq_id * {_PACK_CAPACITY} AS BIGINT) AS start_in_seq,
       CAST(GREATEST(off, seq_id * {_PACK_CAPACITY}) - off AS BIGINT)
         AS doc_tok_start,
       CAST(LEAST(off + n_tok, (seq_id + 1) * {_PACK_CAPACITY})
            - GREATEST(off, seq_id * {_PACK_CAPACITY}) AS BIGINT) AS frag_len
FROM frags
"""


@query("sequence_packing_layout", _PACK_SQL)
def sequence_packing_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing of the documents corpus into
    {_PACK_CAPACITY}-token training sequences, under the exact gate:
    the hierarchical-prefix-sum layout must hash-match the oracle's
    single global cumsum bit-for-bit (all-BIGINT arithmetic). The
    division shapes are floor-safe because offsets are non-negative —
    DuckDB's truncating // and Spark's toward-zero cast agree on the
    whole domain."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return pack_sequences(d)
