"""Incremental view maintenance (IVM) algebra for JOIN and DISTINCT
views — the 100 TB pattern for keeping derived tables fresh without
full recomputation.

For an inner-join view V = A >< B and insert-only increments dA, dB:

    delta(V) = dA >< B  UNION ALL  A >< dB  UNION ALL  dA >< dB

(the three terms are disjoint because (old, new) x (old, new) tiles the
new view). The gated query computes the RIGHT side with Spark and the
oracle computes the LEFT side (new view EXCEPT old view) with DuckDB —
a hash match is a machine-checked proof of the maintenance algebra on
real data, the same theorem-query style as cdc_apply_roundtrip
(sync.py) and incremental_agg_merge (sync.py:259, the aggregate case).

Scale shape: the delta terms only ever join an INCREMENT against a base
table — |dA| x |B| key-pruned work, never |A| x |B|. Increments are
small by definition, so Spark broadcasts them and the base sides
never shuffle; nightly view refresh cost tracks the day's data, not
the corpus. DISTINCT views maintain with one anti-join of
distinct(increment) against the view for the same reason.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

# insert-increment predicates: "new" orders arrive after the cutoff;
# "new" customers are a sparse stride of keys
_ORD_CUTOFF = "2000-01-01"
_CUST_STRIDE = 47


def join_view_delta(
    a_old: DataFrame,
    a_new: DataFrame,
    b_old: DataFrame,
    b_new: DataFrame,
    on: list[str],
) -> DataFrame:
    """Delta rows of the inner-join view under insert-only increments:
    dA><B0 + A0><dB + dA><dB, each tagged with its provenance term.
    Increments are broadcast — the base sides are only key-probed."""
    return (
        broadcast(a_new).join(b_old, on).withColumn("delta_src", F.lit("new_a"))
        .unionByName(a_old.join(broadcast(b_new), on).withColumn("delta_src", F.lit("new_b")))
        .unionByName(a_new.join(broadcast(b_new), on).withColumn("delta_src", F.lit("both_new")))
    )


@query(
    "ivm_join_delta",
    f"""
WITH a0 AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_orderdate < TIMESTAMP '{_ORD_CUTOFF}'
), da AS (
  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
  WHERE o_orderdate >= TIMESTAMP '{_ORD_CUTOFF}'
), b0 AS (
  SELECT c_custkey, c_mktsegment FROM customer
  WHERE c_custkey % {_CUST_STRIDE} <> 0
), db AS (
  SELECT c_custkey, c_mktsegment FROM customer
  WHERE c_custkey % {_CUST_STRIDE} = 0
), old_v AS (
  SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment
  FROM a0 JOIN b0 ON o_custkey = c_custkey
), new_v AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, c.c_mktsegment
  FROM (SELECT * FROM a0 UNION ALL SELECT * FROM da) o
  JOIN (SELECT * FROM b0 UNION ALL SELECT * FROM db) c
    ON o.o_custkey = c.c_custkey
), delta AS (
  SELECT * FROM new_v EXCEPT ALL SELECT * FROM old_v
)
SELECT o_orderkey, o_custkey, o_totalprice, c_mktsegment,
       CASE WHEN o_custkey % {_CUST_STRIDE} <> 0 THEN 'new_a'
            WHEN o_orderkey IN (SELECT o_orderkey FROM a0) THEN 'new_b'
            ELSE 'both_new' END AS delta_src
FROM delta
""",
)
def ivm_join_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maintenance delta of the orders><customer view when post-{_ORD_CUTOFF}
    orders and stride-{_CUST_STRIDE} customers arrive as inserts. Spark
    evaluates the three-term IVM algebra; the oracle evaluates the spec
    (new view EXCEPT old view) — the hash match proves the algebra."""
    o = ensure_parallelism(read_table(spark, sf_dir, "orders")).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    c = ensure_parallelism(read_table(spark, sf_dir, "customer")).select(
        "c_custkey", "c_mktsegment"
    )
    cutoff = F.lit(_ORD_CUTOFF).cast("timestamp")
    a0 = o.filter(F.col("o_orderdate") < cutoff).drop("o_orderdate")
    da = o.filter(F.col("o_orderdate") >= cutoff).drop("o_orderdate")
    b0 = c.filter(F.col("c_custkey") % _CUST_STRIDE != 0)
    db = c.filter(F.col("c_custkey") % _CUST_STRIDE == 0)
    return join_view_delta(
        a0.withColumn("__k", F.col("o_custkey")),
        da.withColumn("__k", F.col("o_custkey")),
        b0.withColumn("__k", F.col("c_custkey")),
        db.withColumn("__k", F.col("c_custkey")),
        ["__k"],
    ).select("o_orderkey", "o_custkey", "o_totalprice", "c_mktsegment", "delta_src")


def distinct_view_delta(view_vals: DataFrame, increment: DataFrame) -> DataFrame:
    """New members of a DISTINCT view: distinct(increment) anti-joined
    against the existing view — O(|increment|) join work. The anti-join
    keys are NULL-SAFE (<=>): DISTINCT/EXCEPT algebra treats NULLs as
    equal, so a (1, NULL) already in the view must not be reported as
    new on every refresh (a plain equality anti-join would — review
    finding)."""
    cols = increment.columns
    inc = increment.distinct()
    vw = view_vals
    # frame-indexed column refs (not string paths): survives column
    # names containing dots
    cond = None
    for c in cols:
        eq = inc[c].eqNullSafe(vw[c])
        cond = eq if cond is None else (cond & eq)
    return inc.join(vw, cond, "left_anti").select(
        *[inc[c].alias(c) for c in cols]
    )


@query(
    "ivm_distinct_delta",
    f"""
WITH old_v AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
  WHERE event_id % 10 <> 0
), inc AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events
  WHERE event_id % 10 = 0
)
SELECT user_id, day FROM inc
EXCEPT
SELECT user_id, day FROM old_v
""",
)
def ivm_distinct_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta of the DISTINCT active-(user, day) view when every 10th
    event arrives as the increment: the pairs the increment introduces
    that the view has never seen. Spark uses distinct+anti-join (the
    incremental form); the oracle uses EXCEPT over full recomputation."""
    ev = ensure_parallelism(read_table(spark, sf_dir, "events")).select(
        "event_id", "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    old_v = ev.filter(F.col("event_id") % 10 != 0).select("user_id", "day").distinct()
    inc = ev.filter(F.col("event_id") % 10 == 0).select("user_id", "day")
    return distinct_view_delta(old_v, inc)
