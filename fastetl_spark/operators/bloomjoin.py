"""Bloom-filter semi-join prefilter — the classic big-join shuffle
reducer, with its false-positive behavior measured under the exact gate.

At 100 TB the dominant join cost is shuffling fact rows that will never
match; the standard fix is to build a compact Bloom filter over the
(small) build side's keys, broadcast it, and drop non-members BEFORE the
shuffle (Spark's own runtime bloom pushdown does exactly this when
thresholds allow). This module implements the pattern explicitly with a
PORTABLE hash — two md5-derived bit positions (the dedup_index
md5-prefix recipe, dedup.py:68) instead of xxhash — so DuckDB computes
the identical filter and the whole measurement (pass counts, true
matches, false positives per group) is bit-deterministic and
hash-gated. Production code would keep xxhash64/Spark's built-in
bloom; the portable variant is the verifiable contract for the pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

_M_BITS = 8192  # filter size in bits
_SEGMENT = "BUILDING"


def _bit_positions(key: Column) -> tuple[Column, Column]:
    """Two independent bit positions from one md5: hex chars 1-8 and
    9-16 parsed base-16, mod the filter size. DuckDB twin:
    ``('0x' || substr(md5(CAST(k AS VARCHAR)), off, 8))::BIGINT % m``."""
    h = F.md5(key.cast("string"))
    p1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % _M_BITS
    p2 = F.conv(F.substring(h, 9, 8), 16, 10).cast("long") % _M_BITS
    return p1, p2


def bloom_prefilter(
    probe: DataFrame, probe_key: str, build_keys: DataFrame, key_col: str
) -> DataFrame:
    """Tag each probe row with ``bloom_pass``: whether both of its bit
    positions are set in the filter built from ``build_keys``.

    The filter materializes as a DISTINCT-positions table (<= m rows,
    here <= {_M_BITS}) that is BROADCAST — the probe side never
    shuffles; membership is two broadcast-hash-join lookups. A false
    positive costs one wasted downstream comparison, never a wrong
    result (callers re-verify with the exact join)."""
    p1, p2 = _bit_positions(F.col(key_col))
    bits = (
        build_keys.select(F.explode(F.array(p1, p2)).alias("pos"))
        .distinct()
        .withColumn("set1", F.lit(True))
    )
    q1, q2 = _bit_positions(F.col(probe_key))
    tagged = probe.withColumn("__p1", q1).withColumn("__p2", q2)
    b1 = bits.select(F.col("pos").alias("__p1"), F.col("set1").alias("__b1"))
    b2 = bits.select(F.col("pos").alias("__p2"), F.col("set1").alias("__b2"))
    return (
        tagged.join(broadcast(b1), "__p1", "left")
        .join(broadcast(b2), "__p2", "left")
        .withColumn(
            "bloom_pass",
            F.coalesce(F.col("__b1"), F.lit(False))
            & F.coalesce(F.col("__b2"), F.lit(False)),
        )
        .drop("__p1", "__p2", "__b1", "__b2")
    )


@query(
    "bloom_semi_join_stats",
    f"""
WITH dim AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = '{_SEGMENT}'
), bits AS (
  SELECT DISTINCT pos FROM (
    SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
             % {_M_BITS} AS pos
    FROM dim
    UNION
    SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 9, 8))::BIGINT
             % {_M_BITS}
    FROM dim
  )
), flags AS (
  SELECT o_orderpriority,
         (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT
            % {_M_BITS} IN (SELECT pos FROM bits)
          AND
          ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 9, 8))::BIGINT
            % {_M_BITS} IN (SELECT pos FROM bits)) AS pass,
         o_custkey IN (SELECT c_custkey FROM dim) AS hit
  FROM orders
)
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
       CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
       CAST(SUM(CASE WHEN pass AND NOT hit THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos
FROM flags GROUP BY o_orderpriority
""",
)
def bloom_semi_join_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-priority: how many orders the '{_SEGMENT}'-segment
    Bloom filter passes vs how many truly match — pass count, true
    matches, and false positives. Every Bloom decision is md5-portable,
    so the FP accounting itself hash-matches DuckDB; a Bloom MISS is
    proven never to lose a true match (n_true_match <= n_bloom_pass
    per group is implied by the gate, and pinned in tests)."""
    customers = ensure_parallelism(read_table(spark, sf_dir, "customer"))
    orders = ensure_parallelism(read_table(spark, sf_dir, "orders"))
    dim = (
        customers.filter(F.col("c_mktsegment") == _SEGMENT)
        .select("c_custkey")
        .distinct()
    )
    tagged = bloom_prefilter(orders, "o_custkey", dim, "c_custkey")
    with_hit = tagged.join(
        broadcast(dim.withColumn("__hit", F.lit(True))),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    ).withColumn("hit", F.coalesce(F.col("__hit"), F.lit(False)))
    return with_hit.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0)).alias("n_bloom_pass"),
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("n_true_match"),
        F.sum(
            F.when(F.col("bloom_pass") & ~F.col("hit"), 1).otherwise(0)
        ).alias("n_false_pos"),
    )
