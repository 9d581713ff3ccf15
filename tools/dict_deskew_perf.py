#!/usr/bin/env python
"""A/B micro-benchmark for the r14 dictionary-key de-skew rewrites.

The full bench at sf0.1 barely exercises the defect the rewrites fix
(5-task parallelism on a 32-core box only shows once per-task sort
work dominates fixed overheads), so this harness measures the two
plan shapes head-to-head on a synthetic corpus large enough for the
skew to bite, in ONE session, best-of-N each, noop sink (guide
section 1.4):

  A (old shape)  row_number() + count(*) windows partitioned by the
                 5-value dictionary column alone — 5 tasks total.
  B (new shape)  ranks.grouped_row_ranks — bucketed_cum_sum over the
                 (group, value) support partitioned by (group,
                 bucket), cluster-wide parallelism.

Also A/B's the GROUPED_AGG pandas-UDAF Gini (whole group through one
python worker) against the native tie-block rank-sum decomposition
the gated query now uses.

Rows default to 4M (~the skew regime on 32 local cores); override
with ROWS=<n>. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F

from fastetl_spark.operators import ranks
from fastetl_spark.session import get_spark

ROWS = int(os.environ.get("ROWS", "4000000"))
REPS = int(os.environ.get("REPS", "3"))
TYPES = ["click", "view", "purchase", "scroll", "hover"]


def timed(df) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = get_spark("dict-deskew-perf", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # Synthetic events: 5-value dictionary key, double values with
    # heavy ties (3 decimal places), deterministic.
    base = (
        spark.range(ROWS)
        .withColumn("event_type", F.element_at(
            F.array(*[F.lit(t) for t in TYPES]),
            (F.col("id") % 5 + 1).cast("int")))
        .withColumn("value", F.round(
            (F.pmod(F.xxhash64("id"), 100000) / 97.0), 3))
        .withColumnRenamed("id", "event_id")
    )
    base = base.repartition(int(cpus)).localCheckpoint()  # fix the input, untimed

    out: dict[str, float] = {"rows": ROWS}

    # --- rank family: old window shape vs grouped_row_ranks ---------
    spark.sparkContext.setJobDescription("A: dict-keyed windows (old)")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    old_rank = (
        base.withColumn("r", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("lvl", ((F.col("r") - 1) * 128 / (F.col("n") - 1)).cast("int"))
    )
    out["rank_window_old_sec"] = timed(old_rank)

    spark.sparkContext.setJobDescription("B: grouped_row_ranks (new)")
    ranked, _sup, _b, _tot = ranks.grouped_row_ranks(
        base, "event_type", "value", "event_id")
    new_rank = ranked.withColumn(
        "lvl", ((F.col("r") - 1) * 128 / (F.col("n") - 1)).cast("int"))
    out["rank_primitive_new_sec"] = timed(new_rank)

    # --- gini: GROUPED_AGG UDAF vs native decomposition -------------
    # Same two shapes as multimodal.gini_grouped_udaf (old gated form)
    # and the r14 gated gini_by_event_type, inlined over the synthetic
    # frame so both run in this one session.
    from pyspark.sql.functions import pandas_udf

    from fastetl_spark.operators.multimodal import gini_scalar

    @pandas_udf("double")
    def gini(v: pd.Series) -> float:
        return gini_scalar(v.to_numpy(dtype=np.float64))

    spark.sparkContext.setJobDescription("A: gini GROUPED_AGG UDAF (old)")
    out["gini_udaf_old_sec"] = timed(
        base.groupBy("event_type").agg(gini("value").alias("gini"))
    )

    spark.sparkContext.setJobDescription("B: gini native rank-sum (new)")
    q = base.select(
        "event_type",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("qv"),
    )
    sup = q.groupBy("event_type", "qv").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    sup, bounds = ranks.materialize_with_bounds(sup, "qv")
    totals = ranks.collect_bucket_totals(
        sup, "qv", "c", bounds=bounds, partition_cols=["event_type"])
    cum = ranks.bucketed_cum_sum(
        sup, "qv", "c", bounds=bounds, partition_cols=["event_type"],
        out_col="cb", offsets=ranks.totals_to_offsets(totals, len(bounds) + 1))
    dec = "DECIMAL(38,0)"
    native = (
        cum.withColumn(
            "half",
            F.expr(
                f"CASE WHEN c % 2 = 0 THEN CAST(c DIV 2 AS {dec})"
                f" * CAST(c + 1 AS {dec})"
                f" ELSE CAST(c AS {dec}) * CAST((c + 1) DIV 2 AS {dec}) END"))
        .groupBy("event_type")
        .agg(
            F.sum("c").cast("long").alias("n"),
            F.sum(F.expr(f"CAST(qv AS {dec}) * CAST(c AS {dec})")).alias("total"),
            F.sum(F.expr(
                f"CAST(qv AS {dec})"
                f" * (CAST(c AS {dec}) * CAST(cb AS {dec}) + half)")).alias("rank_sum"))
        .select(
            "event_type",
            ((F.lit(2) * F.col("rank_sum")).cast("double")
             / (F.col("n") * F.col("total")).cast("double")
             - (F.col("n") + F.lit(1)).cast("double") / F.col("n").cast("double")
             ).alias("gini"))
    )
    out["gini_native_new_sec"] = timed(native)

    spark.sparkContext.setJobDescription(None)
    out["rank_speedup"] = round(
        out["rank_window_old_sec"] / out["rank_primitive_new_sec"], 2)
    out["gini_speedup"] = round(
        out["gini_udaf_old_sec"] / out["gini_native_new_sec"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
