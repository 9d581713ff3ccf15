"""Fifth tier: the remaining classic TPC-H-shaped aggregates (q6 simple
predicate revenue, q12 shipmode classification, q14 promo ratio).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fastetl_spark.functions.stable import dec
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
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_count,
           CAST(SUM(CASE WHEN o_orderstatus <> 'F' THEN 1 ELSE 0 END) AS BIGINT) AS open_count
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


_Q7_SQL = """
SELECT supp_nation, cust_nation, order_year,
       CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INT) AS order_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS rev
  FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation ns ON ns.n_nationkey = s_nationkey
    JOIN nation nc ON nc.n_nationkey = c_nationkey
  WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
      OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, order_year
"""


@query("q7_volume_shipping", _Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    ns = n.select(F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation"))
    nc = n.select(F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation"))
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    j = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(ns), s.s_nationkey == F.col("ns_key"))
        .join(broadcast(nc), c.c_nationkey == F.col("nc_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select("supp_nation", "cust_nation", F.year("l_shipdate").alias("order_year"), rev.alias("rev"))
        .groupBy("supp_nation", "cust_nation", "order_year")
        .agg(F.round(F.sum("rev"), 2).cast("double").alias("revenue"))
    )


_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2000-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
"""


@query("q15_top_supplier", _Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max-over-aggregate subquery: supplier(s) hitting the maximum
    period revenue; exact decimal equality makes the tie-compare safe."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-07-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(rev).alias("total_rev")
    )
    max_rev = revenue.agg(F.max("total_rev").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(broadcast(max_rev), F.col("total_rev") == F.col("m"))
        .select("s_suppkey", "s_name", F.round("total_rev", 2).cast("double").alias("total_revenue"))
    )


_Q22_SQL = """
WITH pos AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_bal
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg_bal FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_mktsegment
"""


@query("q22_global_sales_opportunity", _Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + anti-join: rich customers who never ordered,
    by segment (q22 adapted to the fixture schema)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((F.sum(dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal"))
    )
    rich = c.join(broadcast(avg_bal), F.col("c_acctbal") > F.col("avg_bal")).drop("avg_bal")
    no_orders = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return no_orders.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum(dec("c_acctbal")), 2).cast("double").alias("total_bal"),
    )


_Q21_SQL = """
WITH multi_supp AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING COUNT(DISTINCT l_suppkey) > 1
), late AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  WHERE l_shipdate > o_orderdate
)
SELECT s_name, COUNT(*) AS numwait
FROM late
  JOIN multi_supp USING (l_orderkey)
  JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
"""


@query("q21_waiting_suppliers", _Q21_SQL)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q21-shaped: suppliers with late shipments on multi-supplier
    orders — HAVING over distinct-count + semi-join composition."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    multi = (
        l.groupBy("l_orderkey")
        .agg(F.count_distinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    late = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        late.join(multi, "l_orderkey")
        .join(broadcast(s), late.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


_ROLLING_SQL = """
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
         PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW
       ), 2) AS DOUBLE) AS rolling_7d_total
FROM orders
"""


@query("rolling_7day_revenue", _ROLLING_SQL)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-customer rolling 7-day (6*86400s back +
    today) order total over event time — range frames need a numeric
    ordering key, so the timestamp becomes epoch seconds."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-6 * 86400, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.round(F.sum(dec("o_totalprice")).over(w), 2).cast("double").alias("rolling_7d_total"),
    )


_Q13_SQL = """
WITH per_cust AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM per_cust
GROUP BY c_count
"""


@query("q13_customer_distribution", _Q13_SQL)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q13: distribution of customers by order count (left join keeps
    zero-order customers; COUNT(col) skips the null side)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


_Q16_SQL = """
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size IN (1, 5, 10, 15)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
  )
GROUP BY p_brand, p_type
"""


@query("q16_supplier_part_counts", _Q16_SQL)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q16-shaped: distinct supplier counts per brand/type, excluding a
    NOT IN supplier subset (anti-join; no nulls in s_suppkey so NOT IN
    has no three-valued-logic trap here)."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size").isin(1, 5, 10, 15))
    bad = read_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    return (
        l.join(broadcast(p), l.l_partkey == p.p_partkey)
        .join(broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q20_SQL = """
WITH part_qty AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS total_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '2000-01-01' AND l_shipdate < TIMESTAMP '2001-01-01'
  GROUP BY l_partkey, l_suppkey
), heavy AS (
  SELECT DISTINCT l_suppkey FROM part_qty WHERE total_qty > 50
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM heavy)
"""


@query("q20_heavy_suppliers", _Q20_SQL)
def q20_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q20-shaped: suppliers that moved > 50 units of some part in the
    period (nested IN over a grouped subquery -> semi-join)."""
    l = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    heavy = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 50)
        .select("l_suppkey")
        .distinct()
    )
    return s.join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name"
    )


_Q8_SQL = """
WITH allnations AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
         n_name AS nation
  FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
)
SELECT o_year,
       CAST(SUM(CASE WHEN nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END)
            AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM allnations
GROUP BY o_year
"""


@query("q8_market_share", _Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q8-shaped: one nation's share of yearly supply revenue — ratio of
    two exact decimal sums, divided in double (deterministic)."""
    l = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    vol = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast("decimal(18,6)")
    an = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), F.col("n_name").alias("nation"))
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return an.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


_Q2_SQL = """
WITH costs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), supplier_cost AS (
  SELECT l_partkey, l_suppkey, s_acctbal, s_name, n_name
  FROM costs
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'EUROPE'
)
SELECT sc.l_partkey, sc.l_suppkey, sc.s_acctbal, sc.s_name, sc.n_name
FROM supplier_cost sc
WHERE sc.s_acctbal = (
  SELECT MAX(s_acctbal) FROM supplier_cost i WHERE i.l_partkey = sc.l_partkey
)
"""


@query("q2_best_supplier_in_region", _Q2_SQL)
def q2_best_supplier_in_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q2-shaped: per part, the EUROPE supplier(s) with the best account
    balance — correlated max subquery decorrelated to a window max
    (exact double equality: both sides compare the same stored value)."""
    from pyspark.sql.window import Window

    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    costs = l.select("l_partkey", "l_suppkey").distinct()
    sc = (
        costs.join(broadcast(s), costs.l_suppkey == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    return (
        sc.withColumn("__max_bal", F.max("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("__max_bal"))
        .drop("__max_bal")
    )


_Q11_SQL = """
WITH stock AS (
  SELECT s_nationkey, CAST(l_quantity * l_extendedprice AS DECIMAL(24,6)) AS value
  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
), total AS (
  SELECT SUM(value) AS tv FROM stock
)
SELECT n_name,
       CAST(ROUND(SUM(value), 2) AS DOUBLE) AS nation_value,
       CAST(SUM(value) AS DOUBLE) / CAST((SELECT tv FROM total) AS DOUBLE) AS share
FROM stock JOIN nation ON n_nationkey = s_nationkey
GROUP BY n_name
HAVING CAST(SUM(value) AS DOUBLE) / CAST((SELECT tv FROM total) AS DOUBLE) > 0.01
"""


@query("q11_important_stock", _Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11-shaped: nations holding > 1% of total supplied value — a
    grand-total scalar subquery broadcast against the grouped frame."""
    l = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    value = (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(24,6)")
    stock = l.join(broadcast(s), l.l_suppkey == s.s_suppkey).select(
        "s_nationkey", value.alias("value")
    )
    total = stock.agg(F.sum("value").alias("tv"))
    by_nation = (
        stock.join(broadcast(n), stock.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum("value").alias("nv"))
    )
    return (
        by_nation.crossJoin(broadcast(total))
        .withColumn("share", F.col("nv").cast("double") / F.col("tv").cast("double"))
        .filter(F.col("share") > 0.01)
        .select("n_name", F.round("nv", 2).cast("double").alias("nation_value"), "share")
    )


_NULLSAFE_SQL = """
WITH a AS (
  SELECT event_id, CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS t
  FROM events WHERE event_id % 2 = 0
), b AS (
  SELECT CASE WHEN event_type = 'error' THEN NULL ELSE event_type END AS t,
         COUNT(*) AS n
  FROM events WHERE event_id % 2 = 1
  GROUP BY 1
)
SELECT a.event_id, a.t, b.n
FROM a JOIN b ON a.t IS NOT DISTINCT FROM b.t
"""


@query("null_safe_join", _NULLSAFE_SQL)
def null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics plain equi-joins silently drop."""
    e = read_table(spark, sf_dir, "events")
    t = F.when(F.col("event_type") == "error", F.lit(None)).otherwise(F.col("event_type"))
    a = e.filter(F.col("event_id") % 2 == 0).select("event_id", t.alias("t"))
    b = (
        e.filter(F.col("event_id") % 2 == 1)
        .select(t.alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("n"))
    )
    return a.join(broadcast(b), a.t.eqNullSafe(b.t)).select(a.event_id, a.t, b.n)


_RANKS_SQL = """
SELECT o_orderkey, o_custkey,
       RANK()         OVER w AS price_rank,
       DENSE_RANK()   OVER w AS price_dense_rank,
       PERCENT_RANK() OVER w AS price_pct_rank,
       CUME_DIST()    OVER w AS price_cume_dist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
"""


@query("window_rank_cluster", _RANKS_SQL)
def window_rank_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / percent_rank / cume_dist — the rational-valued
    rank family (exact int ratios -> deterministic doubles)."""
    from pyspark.sql.window import Window

    o = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).alias("price_rank"),
        F.dense_rank().over(w).alias("price_dense_rank"),
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
    )


_STRPRED_SQL = """
SELECT c_custkey,
       LEFT(c_name, 5) AS name_left,
       RIGHT(c_name, 3) AS name_right,
       REPEAT(c_mktsegment, 2) AS seg_twice,
       CONTAINS(c_name, '1') AS has_one,
       STARTS_WITH(c_mktsegment, 'A') AS seg_starts_a,
       ENDS_WITH(c_mktsegment, 'G') AS seg_ends_g,
       POSITION('#' IN c_name) AS hash_pos,
       SPLIT_PART(c_name, '#', 2) AS name_num
FROM customer
"""


@query("string_predicate_cluster", _STRPRED_SQL)
def string_predicate_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.expr("LEFT(c_name, 5)").alias("name_left"),
        F.expr("RIGHT(c_name, 3)").alias("name_right"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.contains(F.col("c_name"), F.lit("1")).alias("has_one"),
        F.startswith(F.col("c_mktsegment"), F.lit("A")).alias("seg_starts_a"),
        F.endswith(F.col("c_mktsegment"), F.lit("G")).alias("seg_ends_g"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
    )


_Q9_SQL = """
WITH profit AS (
  SELECT n_name AS nation, YEAR(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
           - CAST(p_retailprice * l_quantity * 0.01 AS DECIMAL(18,6)) AS amount
  FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    JOIN orders   ON o_orderkey = l_orderkey
)
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM profit GROUP BY nation, o_year
"""


@query("q9_product_type_profit", _Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q9-shaped (TPC-H 2.4.9 adapted: the fixture has no partsupp, so
    supply cost is a retail-price fraction): profit per nation per order
    year through a four-way join. Part/supplier/nation broadcast; the
    only shuffle joins lineitem to orders on the order key. Amounts go
    through exact per-row DECIMAL casts of the double products, so the
    sum is order-independent and engine-identical."""
    l = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).cast("decimal(18,6)")
    cost = (F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.01)).cast("decimal(18,6)")
    return (
        l.join(broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (rev - cost).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), 2).cast("double").alias("sum_profit"))
    )


_ARGMINMAX_SQL = """
WITH ranked AS (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value DESC, event_id DESC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value ASC, event_id ASC) AS rmin
  FROM events
)
SELECT event_type,
       MAX(CASE WHEN rmax = 1 THEN event_id END) AS max_value_event,
       MAX(CASE WHEN rmin = 1 THEN event_id END) AS min_value_event,
       CAST(count_if(value > 50.0) AS BIGINT) AS n_above_50,
       bool_and(value IS NOT NULL) AS all_valued,
       bool_or(value > 99.0) AS any_near_max
FROM ranked
GROUP BY event_type
"""


@query("argminmax_cluster", _ARGMINMAX_SQL)
def argminmax_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate-function surface: max_by/min_by (arg-max/arg-min),
    count_if, bool_and/bool_or. Tie-breaks are made DETERMINISTIC by
    ordering on struct(value, event_id) — a bare max_by over a column
    with duplicate maxima returns an arbitrary row and can never
    hash-match another engine (the oracle expresses the same total
    order with ROW_NUMBER). One groupBy; arg-max via struct comparison
    is a single partial-aggregable expression, not a window pass."""
    e = read_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.max_by("event_id", F.struct("value", "event_id")).alias("max_value_event"),
        F.min_by("event_id", F.struct("value", "event_id")).alias("min_value_event"),
        F.count_if(F.col("value") > 50.0).alias("n_above_50"),
        F.bool_and(F.col("value").isNotNull()).alias("all_valued"),
        F.bool_or(F.col("value") > 99.0).alias("any_near_max"),
    )
