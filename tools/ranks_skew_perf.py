#!/usr/bin/env python
"""Adversarial-skew evidence for operators/ranks (r11 VERDICT ask #1):
measure the bucketed distributed prefix sum against the single-window
form it replaced, across the skew shapes that break naive ranking —
a multi-million-row distinct support (the cnt=1 vocabulary tail), a
one-hot mass distribution, and a multibyte-UTF-8 string key — and
sweep num_buckets to show the parallelism lever the adaptive default
(2 x defaultParallelism, floor 64, cap 1024) turns.

Run: `python tools/ranks_skew_perf.py [n_rows]` (default 2_000_000).
Prints one result line per case; PERF.md records the numbers.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from fastetl_spark.operators.ranks import (
    bucketed_cum_sum,
    materialize_with_bounds,
)
from fastetl_spark.session import get_spark


def timed(label, fn, reps=2):
    walls = []
    for _ in range(reps):
        t0 = time.time()
        n = fn()
        walls.append(time.time() - t0)
    print(f"{label:58s} {min(walls):7.2f}s  ({n} rows)")
    return min(walls)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("ranks-skew-perf", shuffle_partitions=64)
    print(f"n = {n}, defaultParallelism = "
          f"{spark.sparkContext.defaultParallelism}, la1 = "
          f"{os.getloadavg()[0]:.1f}")

    # numeric long tail: every key distinct, cnt == 1 (the vocabulary
    # shape that used to funnel through one window task)
    num = (
        spark.range(n)
        .select(
            (F.col("id") * 2654435761 % 2**31).cast("double").alias("k"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .groupBy("k").agg(F.sum("cnt").alias("cnt"))
    )
    num, bounds = materialize_with_bounds(num, "k")
    print(f"numeric support: {len(bounds) + 1} buckets (adaptive default)")

    def run_bucketed(g, key, bs):
        return lambda: bucketed_cum_sum(
            g, key, "cnt", bounds=bs
        ).agg(F.sum("cum_below")).collect() and g.count()

    def run_window(g, key):
        def f():
            w = (
                Window.orderBy(key)
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            g.withColumn(
                "cum_below",
                F.coalesce(F.sum("cnt").over(w), F.lit(0)).cast("long"),
            ).agg(F.sum("cum_below")).collect()
            return g.count()
        return f

    timed("numeric tail | single-partition window (the old form)",
          run_window(num, "k"))
    from fastetl_spark.operators.ranks import range_bounds
    for nb in (4, 64, 256, 1024):
        bs = range_bounds(num, "k", nb)
        timed(f"numeric tail | bucketed prefix sum, {nb:4d} buckets",
              run_bucketed(num, "k", bs))

    # one-hot: one key carries ~all mass, rest singletons (bounds
    # collapse to few distinct split points — worst balance case)
    hot = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 100 != 0, 0.0)
            .otherwise(F.col("id").cast("double")).alias("k"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .groupBy("k").agg(F.sum("cnt").alias("cnt"))
    )
    hot, hb = materialize_with_bounds(hot, "k")
    timed("one-hot mass | bucketed prefix sum (adaptive)",
          run_bucketed(hot, "k", hb))

    # multibyte-UTF-8 string keys: rank by the 7-byte prefix image
    st = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("día-"),
                F.md5(F.col("id").cast("string")),
            ).alias("k"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .groupBy("k").agg(F.sum("cnt").alias("cnt"))
    )
    st, sb = materialize_with_bounds(st, "k")
    timed("utf-8 string keys | bucketed prefix sum (adaptive)",
          run_bucketed(st, "k", sb))
    timed("utf-8 string keys | single-partition window",
          run_window(st, "k"))

    # URL-style corpus: ALL keys share a 20-byte prefix. The absolute
    # 7-byte image collapses to one double -> one bucket -> the
    # within-bucket window degrades to a single task (the r12 VERDICT
    # finding). The prefix strip (KeyBounds) must restore flat-key
    # performance; `collapsed` below forces the old behavior for
    # comparison by discarding the carried prefix.
    url = (
        spark.range(n)
        .select(
            F.concat(
                F.lit("https://example.com/"),
                F.md5(F.col("id").cast("string")),
            ).alias("k"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .groupBy("k").agg(F.sum("cnt").alias("cnt"))
    )
    url, ub = materialize_with_bounds(url, "k")
    print(f"url corpus: stripped prefix = {bytes(ub.prefix)!r}, "
          f"{len(ub) + 1} buckets")
    timed("url-prefix keys | bucketed, PREFIX-STRIPPED image",
          run_bucketed(url, "k", ub))
    # [] = every row in one bucket: exactly what the collapsed
    # absolute image produced (any split list vs a constant image
    # lands all mass in the split's bucket)
    timed("url-prefix keys | bucketed, collapsed absolute image (old)",
          run_bucketed(url, "k", []))
    timed("url-prefix keys | single-partition window",
          run_window(url, "k"))


if __name__ == "__main__":
    main()
