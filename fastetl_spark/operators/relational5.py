"""Fifth tier: the remaining classic TPC-H-shaped aggregates (q6 simple
predicate revenue, q12 shipmode classification, q14 promo ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query


@query(
    "q6_forecast_revenue",
    """
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
           AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q12_priority_shipping_classes",
    """
    SELECT o_orderpriority,
           SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS finished_count,
           SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS open_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1999-01-01'
      AND l_shipdate <  TIMESTAMP '2000-01-01'
    GROUP BY o_orderpriority
    """,
)
def q12_priority_shipping_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("finished_count"),
            F.sum(F.when(F.col("o_orderstatus") != "F", 1).otherwise(0)).alias("open_count"),
        )
    )


@query(
    "q14_promo_revenue_ratio",
    """
    WITH j AS (
      SELECT p_type, CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        AND l_shipdate <  TIMESTAMP '1999-07-01'
    )
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END) AS DOUBLE)
                / CAST(SUM(rev) AS DOUBLE) AS DOUBLE) AS promo_pct,
           COUNT(*) AS n_items
    FROM j
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-07-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    j = l.join(broadcast(p), l.l_partkey == p.p_partkey).select(
        "p_type", rev.alias("rev")
    )
    promo = F.sum(F.when(F.col("p_type").like("PROMO%"), F.col("rev")).otherwise(F.lit(0).cast("decimal(18,6)")))
    return j.agg(
        (F.lit(100.0) * promo.cast("double") / F.sum("rev").cast("double")).alias("promo_pct"),
        F.count("*").alias("n_items"),
    )


_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@query("grouping_sets_stats", _GROUPING_SETS_SQL)
def grouping_sets_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — same SQL text runs on Spark SQL and the
    oracle (rollup/cube's general form)."""
    from fastetl_spark.io.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)
