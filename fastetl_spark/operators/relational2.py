"""Second tier of the relational surface: correlated subqueries, HAVING,
disjunctive predicates, CUBE, pivot, JSON extraction, min-per-group —
the aggregation/subquery shapes the reference punted to its source
databases via query-as-source (S2), exposed here as first-class ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.functions.stable import dec
from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query

# --- q4-style: EXISTS correlated subquery -------------------------------


@query(
    "q4_priority_with_late_items",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = read_table(spark, sf_dir, "lineitem")
    late = l.join(o, l.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- q17-style: scalar correlated subquery (per-group average) ----------


@query(
    "q17_below_avg_quantity",
    """
    WITH part_avg AS (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                        / COUNT(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_price
    FROM lineitem JOIN part_avg USING (l_partkey)
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_below_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    part_avg = l.groupBy("l_partkey").agg(
        (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias("avg_qty")
    )
    return (
        l.join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(dec("l_extendedprice")), 2).cast("double").alias("total_price"),
        )
    )


# --- q18-style: HAVING over aggregation ---------------------------------


@query(
    "q18_large_orders",
    """
    SELECT l_orderkey,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_qty
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    agg = l.groupBy("l_orderkey").agg(F.sum(dec("l_quantity")).alias("qty_dec"))
    return agg.filter(F.col("qty_dec") > 150).select(
        "l_orderkey", F.round(F.col("qty_dec"), 2).cast("double").alias("total_qty")
    )


# --- q19-style: disjunctive multi-clause predicate ----------------------


@query(
    "q19_disjunctive_filter",
    """
    SELECT COUNT(*) AS n,
           CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
       OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
       OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
    """,
)
def q19_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & F.col("p_size").between(1, 15))
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(rev), 2).cast("double").alias("revenue"),
        )
    )


# --- CUBE ----------------------------------------------------------------


@query(
    "cube_order_stats",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n_orders"))


# --- pivot (conditional aggregation) ------------------------------------


@query(
    "pivot_event_type_counts",
    """
    SELECT user_id,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
)
def pivot_event_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


# --- JSON extraction (events.props) -------------------------------------


@query(
    "json_extract_props",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_value
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k_value")
    )


# --- min-per-group (q2-style) -------------------------------------------


@query(
    "min_cost_supplier_per_part",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), ranked AS (
      SELECT l_partkey, l_suppkey, s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY l_partkey
                                ORDER BY s_acctbal, l_suppkey) AS rn
      FROM ps JOIN supplier ON s_suppkey = l_suppkey
    )
    SELECT l_partkey, l_suppkey, s_acctbal FROM ranked WHERE rn = 1
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    ps = l.select("l_partkey", "l_suppkey").distinct()
    joined = ps.join(broadcast(s), ps.l_suppkey == s.s_suppkey)
    w = Window.partitionBy("l_partkey").orderBy(F.asc("s_acctbal"), F.asc("l_suppkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "s_acctbal")
    )


# --- distinct counting: exact + approximate -----------------------------


@query(
    "distinct_users_per_type",
    "SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type",
)
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n_users"))


@query("approx_distinct_users")  # HLL sketch — engine-specific, rows-only check
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB path where exact
    distinct would shuffle every key; rsd=0.01 keeps the sketch small."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("n_users_approx")
    )


# --- string function cluster (F-ops beyond the cleaners) -----------------


@query(
    "string_function_cluster",
    """
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS segment_lower,
           TRIM(CONCAT('  ', c_name, '  ')) AS name_trimmed,
           LPAD(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           SUBSTR(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           REPLACE(c_name, '#', '-') AS name_dashed,
           REVERSE(c_mktsegment) AS segment_reversed
    FROM customer
    """,
)
def string_function_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("name_trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.reverse("c_mktsegment").alias("segment_reversed"),
    )


@query(
    "variant_props_stats",
    """
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1
    """,
)
def variant_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured aggregation through Spark 4's VARIANT type:
    parse_json ONCE into the binary variant encoding, then typed
    variant_get extraction — the modern path for JSON columns
    (string-path get_json_object, used by json_extract_props, re-parses
    the text per access; variant parses once and its binary form is
    columnar-friendly). At 100 TB the parse cost dominates JSON
    pipelines, so parse-once-extract-many is the difference between one
    and N text scans of every payload."""
    e = read_table(spark, sf_dir, "events")
    v = e.select(F.parse_json("props").alias("pv"))
    k = F.try_variant_get(F.col("pv"), "$.k", "bigint")
    return (
        v.select(k.alias("k"))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("k_sum"))
    )


# --- VariantType extraction (Spark 4 semi-structured path) ---------------


@query(
    "variant_props_rollup",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
             AS sum_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.absent') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def variant_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 semi-structured path: props parsed ONCE into a
    VariantType column (binary-encoded, JVM-side traversal — the
    modern replacement for per-path get_json_object re-parsing),
    then typed variant_get extraction feeds an exact integer rollup;
    try_variant_get on a missing path must yield NULL, not an error.
    Oracle re-derives with DuckDB's JSON functions."""
    e = read_table(spark, sf_dir, "events")
    v = e.select("event_type", F.parse_json("props").alias("v"))
    return (
        v.select(
            "event_type",
            F.try_variant_get(F.col("v"), "$.k", "int").alias("k"),
            F.try_variant_get(F.col("v"), "$.absent", "int").alias("absent"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.col("absent").isNull().cast("long")).alias("n_missing"),
        )
    )
