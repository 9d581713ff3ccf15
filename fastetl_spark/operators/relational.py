"""Core relational query surface: scan/project/filter/join/agg/window/
set-ops — the reference delegates all of this to the source database via
query-as-source (reference fast_etl.py:162-187); here it is first-class,
expressed declaratively so Catalyst gets pushdown/pruning/join-selection.

Scale notes (local[N] correctness, 1000-executor design):
- dimension joins (region/nation/supplier/customer) are broadcast —
  no shuffle of the fact table on the build side;
- aggregations are partial (map-side combine) by construction of
  groupBy().agg();
- filters/projections are pushed into the parquet scan (verified via
  .explain in tests — PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.functions.stable import dec
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

# --- q1: flagship pricing summary (scan -> filter -> agg; SURVEY §7.1.2) ---

_Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(8,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", _Q1_SQL)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = ensure_parallelism(read_table(spark, sf_dir, "lineitem"))
    disc_price = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        T.DecimalType(18, 6)
    )
    charge = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * (F.lit(1.0) + F.col("l_tax"))
    ).cast(T.DecimalType(18, 6))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("l_extendedprice")).alias("avg_price"),
            (F.sum(dec("l_discount", 8, 6)).cast("double") / F.count("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


# --- q3: shipping priority (3-way join + agg + top-n) ---

_Q3_SQL = """
SELECT
  l_orderkey,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
  o_orderdate,
  o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", _Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        T.DecimalType(18, 6)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


# --- q5: local supplier volume (6-way join) ---

_Q5_SQL = """
SELECT
  n_name,
  CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@query("q5_local_supplier", _Q5_SQL)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        T.DecimalType(18, 6)
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(s), (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


# --- window: top-n per group (A3's keep-first generalized) ---

_TOPN_SQL = """
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) t
WHERE rn <= 3
"""


@query("topn_orders_per_customer", _TOPN_SQL)
def topn_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn")
    )


# --- rollup aggregation (§2.5 extension: grouping sets for free) ---

_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


@query("rollup_order_stats", _ROLLUP_SQL)
def rollup_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("total_price"),
    )


# --- set operations (§2.6; EXCEPT/INTERSECT beyond reference's UNION ALL) ---


@query(
    "except_open_not_finished",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def except_open_not_finished(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract == set-semantic EXCEPT (matches the SQL oracle)
    return open_c.subtract(fin_c)


@query(
    "union_all_counts",
    """
    SELECT src, COUNT(*) AS n FROM (
      SELECT 'orders' AS src FROM orders
      UNION ALL
      SELECT 'lineitem' AS src FROM lineitem
    ) u GROUP BY src
    """,
)
def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").select(F.lit("orders").alias("src"))
    l = read_table(spark, sf_dir, "lineitem").select(F.lit("lineitem").alias("src"))
    return o.unionByName(l).groupBy("src").agg(F.count("*").alias("n"))


# --- semi / anti joins (J4/J5 building blocks) ---


@query(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "suppliers_with_shipments",
    """
    SELECT s_suppkey, s_name FROM supplier
    WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
    """,
)
def suppliers_with_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    l = read_table(spark, sf_dir, "lineitem")
    return s.join(l, s.s_suppkey == l.l_suppkey, "left_semi").select("s_suppkey", "s_name")


# --- S1/P1: projection pushdown scan (destination-driven column list) ---


@query(
    "projection_scan",
    "SELECT l_orderkey, l_partkey, l_quantity FROM lineitem WHERE l_linenumber = 1",
)
def projection_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Destination-driven projection (reference fast_etl.py:290-310):
    read only the destination's columns — Catalyst prunes the parquet
    scan to exactly ReadSchema=[l_orderkey,l_partkey,l_quantity,l_linenumber]."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_linenumber") == 1).select("l_orderkey", "l_partkey", "l_quantity")


# --- P3: high-watermark predicate (incremental diff read) ---


@query(
    "watermark_filter",
    """
    SELECT o_orderkey, o_custkey, o_orderdate FROM orders
    WHERE o_orderdate > TIMESTAMP '2000-06-01 00:00:00'
    """,
)
def watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_build_filter_condition semantics (reference fast_etl.py:370-427):
    rows strictly newer than the stored max watermark; pushed to the scan."""
    o = read_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderdate") > F.lit("2000-06-01 00:00:00").cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )


# --- P4/S4: key-interval range scan ---


@query(
    "key_range_scan",
    "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000",
)
def key_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """copy_by_key_interval's BETWEEN predicate (copy_db_extensions.py:106)
    — in Spark this is one of N parallel JDBC partition predicates."""
    l = read_table(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey").between(1000, 2000)).select("l_orderkey", "l_linenumber", "l_quantity")


# --- P7: character strip across string columns ---


@query(
    "char_strip",
    """
    SELECT REGEXP_REPLACE(o_orderpriority, '[-0-9]', '', 'g') AS priority_name, COUNT(*) AS n
    FROM orders GROUP BY 1
    """,
)
def char_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """db_to_csv_operator.py:90-94 char stripping as a vectorized expression."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(F.regexp_replace("o_orderpriority", "[-0-9]", "").alias("priority_name"))
        .groupBy("priority_name")
        .agg(F.count("*").alias("n"))
    )


# --- A2: watermark max ---


@query(
    "watermark_max",
    "SELECT MAX(o_orderdate) AS wm_date, MAX(o_orderkey) AS wm_key FROM orders",
)
def watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.agg(F.max("o_orderdate").alias("wm_date"), F.max("o_orderkey").alias("wm_key"))


# --- A3: duplicate detection by PK with deterministic keep-first ---


@query(
    "dedup_events_keep_first",
    """
    SELECT event_id, user_id, event_type, ts FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def dedup_events_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DuplicatedRowCleaner keep='first' (reference patchwork.py:380-412) with
    an explicit (ts, event_id) tiebreaker — the reference relied on file
    order, which is nondeterministic at scale (SURVEY §7.3.2)."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


# --- A4: distinct values ---


@query("distinct_event_types", "SELECT DISTINCT event_type FROM events")
def distinct_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "events").select("event_type").distinct()


# --- A1/A5: row-count guard + load metric ---


@query(
    "row_count_guard",
    """
    SELECT 'orders' AS tabela, COUNT(*) AS qt_linhas,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS qt_abertas
    FROM orders
    """,
)
def row_count_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """_table_rows_count with optional WHERE (reference fast_etl.py:359-367)."""
    o = read_table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("qt_linhas"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("qt_abertas"),
    ).select(F.lit("orders").alias("tabela"), "qt_linhas", "qt_abertas")
