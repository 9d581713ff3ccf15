#!/usr/bin/env python
"""BM25 max_df evidence on a Zipf-vocabulary corpus (round-9 VERDICT
ask #3).

PERF.md #39 measured the 10k-query BM25 workload on the documents
fixture, whose 31-term / df~77% vocabulary is degenerate: every term is
head, so any meaningful ``max_df`` empties the term set and the lever
cannot be shown doing its real job. This tool generates a
Zipf-distributed corpus at bench scale (operators/retrieval.zipf_corpus
— deterministic md5 log-uniform sampling, the df shape real text has),
runs the 10k-query workload with and without the cap, and records:

- wall seconds for both runs (top-10 per query, no broadcast hint),
- scored-pair counts for both (k=inf candidate volume),
- the bit-equality of every query that contains NO capped term
  (stats-before-cap contract: retained terms score exactly).

Usage: python tools/bm25_zipf_perf.py [n_docs] [vocab]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fastetl_spark.operators.retrieval import (  # noqa: E402
    bm25_from_posting,
    doc_posting,
    zipf_corpus,
    zipf_queries,
)
from fastetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    doc_len, n_queries, q_terms, cap = 40, 10_000, 3, 0.01

    spark = get_spark("bm25-zipf-perf")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"corpus: {n_docs} docs x {doc_len} tokens, vocab {vocab} (Zipf); "
        f"workload: {n_queries} queries x {q_terms} terms; max_df={cap}"
    )

    docs = zipf_corpus(spark, n_docs, doc_len, vocab)
    posting = doc_posting(docs).localCheckpoint()  # build untimed, shared
    queries = zipf_queries(spark, n_queries, q_terms, vocab).localCheckpoint()

    dft = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    head = dft.filter(F.col("df") > cap * n_docs)
    n_head = head.count()
    n_terms_total = dft.count()
    print(
        f"vocab realized: {n_terms_total} distinct terms; "
        f"{n_head} exceed df cap {cap} ({int(cap * n_docs)} docs)"
    )

    walls: dict[str, float] = {}
    pairs: dict[str, int] = {}
    reps = int(os.environ.get("SPARK_GRAFT_ZIPF_REPS", "3"))
    for tag, mdf in (("uncapped", None), ("capped", cap)):
        la1 = os.getloadavg()[0]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            bm25_from_posting(
                posting, queries, k=10, broadcast_queries=False, max_df=mdf
            ).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        walls[tag] = best
        # candidate volume: k=inf row count == scored (query, doc) pairs
        pairs[tag] = bm25_from_posting(
            posting, queries, k=10**9, broadcast_queries=False, max_df=mdf
        ).count()
        print(
            f"{tag:9s}: wall(best of {reps}) {best:6.1f}s  "
            f"pairs {pairs[tag]:>12,}  la1@start {la1:.1f}"
        )

    # tail-score bit-equality: queries with no capped term must produce
    # identical rows under the cap (stats computed before the cap)
    capped_terms = {r["term"] for r in head.collect()}
    qt = queries.select("query_id", F.explode("terms").alias("term"))
    has_head = qt.filter(
        F.col("term").isin(list(capped_terms))
    ).select("query_id").distinct()
    tail_q = queries.join(has_head, "query_id", "left_anti").localCheckpoint()
    n_tail = tail_q.count()
    exact_rows = sorted(
        map(
            tuple,
            bm25_from_posting(
                posting, tail_q, k=10, broadcast_queries=False
            ).collect(),
        )
    )
    capped_rows = sorted(
        map(
            tuple,
            bm25_from_posting(
                posting, tail_q, k=10, broadcast_queries=False, max_df=cap
            ).collect(),
        )
    )
    print(
        f"tail-only queries: {n_tail}; capped == exact bit-for-bit: "
        f"{exact_rows == capped_rows} ({len(exact_rows)} rows)"
    )
    print(
        f"summary: cap pruned {1 - pairs['capped'] / pairs['uncapped']:.1%} "
        f"of pairs, wall {walls['uncapped']:.1f}s -> {walls['capped']:.1f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()
