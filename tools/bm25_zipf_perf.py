#!/usr/bin/env python
"""BM25 max_df evidence on a Zipf-vocabulary corpus (round-9 VERDICT
ask #3).

PERF.md #39 measured the 10k-query BM25 workload on the documents
fixture, whose 31-term / df~77% vocabulary is degenerate: every term is
head, so any meaningful ``max_df`` empties the term set and the lever
cannot be shown doing its real job. This tool runs the SHARED evidence
harness (operators/retrieval.zipf_maxdf_evidence — the same function
the bench guard `bm25_zipf_ok` asserts every run, so tool and gate can
never diverge) at bench scale and prints the walls, scored-pair counts
and the tail bit-equality result (PERF.md #41 records a 50k-doc run).

Usage: python tools/bm25_zipf_perf.py [n_docs] [vocab]
Env: SPARK_GRAFT_ZIPF_REPS (timed reps per config, default 3).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fastetl_spark.operators.retrieval import zipf_maxdf_evidence  # noqa: E402
from fastetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    vocab = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    reps = int(os.environ.get("SPARK_GRAFT_ZIPF_REPS", "3"))

    spark = get_spark("bm25-zipf-perf")
    spark.sparkContext.setLogLevel("ERROR")
    print(
        f"corpus: {n_docs} docs x 40 tokens, vocab {vocab} (Zipf); "
        f"workload: 10000 queries x 3 terms; max_df=0.01; "
        f"la1@start {os.getloadavg()[0]:.1f}"
    )
    ev = zipf_maxdf_evidence(spark, n_docs=n_docs, vocab=vocab, reps=reps)
    print(
        f"uncapped : wall(best of {reps}) {ev['uncapped_sec']:8.1f}s  "
        f"pairs {ev['uncapped_pairs']:>13,}"
    )
    print(
        f"capped   : wall(best of {reps}) {ev['capped_sec']:8.1f}s  "
        f"pairs {ev['capped_pairs']:>13,}  ({ev['n_head']} head terms)"
    )
    print(
        f"tail-only queries: {ev['n_tail_queries']}; capped == exact "
        f"bit-for-bit: {ev['tail_bit_equal']} ({ev['tail_rows']} rows)"
    )
    pruned = 1 - ev["capped_pairs"] / ev["uncapped_pairs"]
    # the tool gates on CORRECTNESS only: a CLI-chosen n_docs/vocab/cap
    # combo may legitimately prune < 5x (ok_prune False) without any
    # bit-equality violation — the bench guard's pinned combo is where
    # the conjunction `ok` applies
    print(
        f"summary: cap pruned {pruned:.1%} of pairs, wall "
        f"{ev['uncapped_sec']:.1f}s -> {ev['capped_sec']:.1f}s; "
        f"correctness ok={ev['ok_correctness']} "
        f"(prune>5x={ev['ok_prune']})  la1@end {os.getloadavg()[0]:.1f}"
    )
    spark.stop()
    if not ev["ok_correctness"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
