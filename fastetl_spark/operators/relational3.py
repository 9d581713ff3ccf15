"""Third tier: window-function cluster, date/time cluster, percentile,
null-handling, and the q10 returned-item report — rounding out the
query surface a reference user would expect from query-as-source (S2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.functions.stable import dec
from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query

# --- window-function cluster (lag/lead/first/last/rank/ntile) -----------


@query(
    "window_function_cluster",
    """
    SELECT event_id, user_id, ts,
           LAG(event_id)  OVER w AS prev_event,
           LEAD(event_id) OVER w AS next_event,
           FIRST_VALUE(event_id) OVER w AS first_event,
           RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS value_rank,
           NTILE(4) OVER w AS quartile,
           COUNT(*) OVER (PARTITION BY user_id) AS user_events
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_function_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wr = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.first("event_id").over(w).alias("first_event"),
        F.rank().over(wr).alias("value_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.count("*").over(Window.partitionBy("user_id")).alias("user_events"),
    )


# --- date/time function cluster -----------------------------------------


@query(
    "date_function_cluster",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(day(o_orderdate) AS INT) AS order_day,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS order_dow,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP) AS due_date,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders
    """,
)
def date_function_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        # Spark dayofweek: 1=Sunday..7=Saturday; DuckDB dayofweek: 0=Sunday..6
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1).alias("order_dow"),
        F.quarter("o_orderdate").alias("order_quarter"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since_epoch_start"),
    )


# --- null-handling cluster ----------------------------------------------


@query(
    "null_handling_cluster",
    """
    SELECT event_id,
           COALESCE(NULLIF(event_type, 'error'), 'unknown') AS type_or_unknown,
           CASE WHEN value > 100 THEN value END AS big_value,
           IFNULL(CASE WHEN value > 100 THEN value END, 0.0) AS big_value_or_zero,
           value IS NULL AS value_missing,
           CASE WHEN event_type = 'error' THEN NULL ELSE event_id END AS id_unless_error
    FROM events
    """,
)
def null_handling_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    big = F.when(F.col("value") > 100, F.col("value"))
    return e.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown")).alias(
            "type_or_unknown"
        ),
        big.alias("big_value"),
        F.ifnull(big, F.lit(0.0)).alias("big_value_or_zero"),
        F.col("value").isNull().alias("value_missing"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("long"))
        .otherwise(F.col("event_id"))
        .alias("id_unless_error"),
    )


# --- exact percentiles (integral-valued column -> stable) ----------------


@query(
    "quantity_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)  AS median_qty,
           quantile_cont(l_quantity, 0.9)  AS p90_qty,
           MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


# --- q10-style: returned-item customer report ---------------------------


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, n_name,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '2000-01-01'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --- variance/stddev via decimal moments (order-stable) ------------------


@query(
    "value_dispersion_stats",
    """
    WITH m AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s2
      FROM events GROUP BY event_type
    )
    SELECT event_type, n,
           s1 / n AS mean_value,
           (s2 - s1 * s1 / n) / (n - 1) AS var_value
    FROM m
    """,
)
def value_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance via exact decimal moments instead of Welford streaming —
    bit-stable across partitionings (the built-in var_samp accumulates
    doubles in partition order)."""
    e = read_table(spark, sf_dir, "events")
    v = dec("value")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    return m.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean_value"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)).alias(
            "var_value"
        ),
    )


_INTERSECT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'view'
"""


@query("intersect_buyers_viewers", _INTERSECT_SQL)
def intersect_buyers_viewers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantic INTERSECT (users who both purchased and viewed),
    completing the set-op family (union_all_counts, except_open_...).
    Spark's intersect is set-semantic like SQL INTERSECT; the planner
    compiles it to a left-semi aggregate, not a double distinct +
    join."""
    e = read_table(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    viewers = e.filter(F.col("event_type") == "view").select("user_id")
    return buyers.intersect(viewers)


_VALUE_WINDOW_SQL = """
SELECT event_id, user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type,
       nth_value(event_type, 2) OVER w AS second_type,
       lead(event_type, 1, 'none') OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


@query("value_window_cluster", _VALUE_WINDOW_SQL)
def value_window_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window functions (first/last/nth/lead-with-default)
    over the full partition frame — the frame must be explicit:
    last_value over the DEFAULT frame (unbounded preceding..current row)
    is a per-row identity, the classic silent-wrong-answer. Ordering
    includes event_id so every positional answer is deterministic."""
    from pyspark.sql import Window

    e = read_table(spark, sf_dir, "events")
    full = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(full).alias("first_type"),
        F.last("event_type").over(full).alias("last_type"),
        F.nth_value("event_type", 2).over(full).alias("second_type"),
        F.lead("event_type", 1, "none").over(seq).alias("next_type"),
    )
