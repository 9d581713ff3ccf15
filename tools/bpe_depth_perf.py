"""64-merge BPE training depth/wall profile (round-8 VERDICT ask #4).

Runs _bpe_train for 64 merges on the sf documents table and prints the
per-merge walls — the claim under test is FLATNESS: each merge's pair
count + replace runs over the vocabulary (distinct words), whose size
is constant in the merge count, so merge #64 should cost what merge #4
does (the materialize-per-merge lineage cut is what guarantees it; an
unchecked lineage would re-run all t prior replaces at step t and walls
would grow linearly).

Usage: python tools/bpe_depth_perf.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from fastetl_spark.io.readers import ensure_parallelism, read_table  # noqa: E402
from fastetl_spark.operators.features import _bpe_train  # noqa: E402
from fastetl_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    timings: list[dict] = []
    t0 = time.monotonic()
    vocab = _bpe_train(docs, n, timings=timings)
    from pyspark.sql import functions as F

    from fastetl_spark.operators.features import _BPE_SEP

    total_tokens = vocab.select(
        F.sum(
            F.col("freq")
            * F.size(
                F.split(
                    F.expr("substring(seq, 2, length(seq) - 2)"),
                    _BPE_SEP + _BPE_SEP,
                )
            )
        ).alias("toks")
    ).first()["toks"]
    wall = time.monotonic() - t0
    walls = [t["seconds"] for t in timings]
    q = lambda p: sorted(walls)[int(p * (len(walls) - 1))]  # noqa: E731
    head = sum(walls[:8]) / min(8, len(walls))
    tail = sum(walls[-8:]) / min(8, len(walls))
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "merges_completed": len(timings),
                "total_wall_s": round(wall, 2),
                "per_merge_p50_s": round(q(0.5), 3),
                "per_merge_p90_s": round(q(0.9), 3),
                "first8_mean_s": round(head, 3),
                "last8_mean_s": round(tail, 3),
                "tail_over_head": round(tail / head, 3) if head else None,
                "final_total_tokens": int(total_tokens),
                "last_merges": [t["pair"] for t in timings[-5:]],
            }
        )
    )


if __name__ == "__main__":
    main()
