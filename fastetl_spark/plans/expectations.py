"""Single-scan expectation suite: the aggregate-level data-quality
report that complements plans/quarantine's row-level split.

The reference's quality surface is per-row repair/reject (patchwork.py)
plus ad-hoc row-count guards (fast_etl.py validation queries); a
100 TB pipeline also wants the deequ-style CONTRACT check — "these
invariants hold over the whole table" — evaluated without one job per
rule. Here every rule is a column predicate folded into ONE aggregate
pass (conditional sums share the scan and combine map-side), then the
single result row is unpivoted into the (rule, n_rows, n_violations,
passed) report. k rules cost one table scan + a one-row exchange, at
any k and any table size.

Rules use the same ``(name, predicate)`` shape as plans/quarantine
(True = valid; NULL predicate results count as violations), so a suite
can be enforced row-level (validate_split) and reported table-level
(expectations_report) from one definition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query


def expectations_report(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """(rule, n_rows, n_violations, passed) — one row per rule, ONE scan
    of `df` total. Rule names must be distinct and are used as interim
    column names, so keep them identifier-shaped."""
    if not rules:
        raise ValueError("expectations_report needs at least one rule")
    names = [name for name, _ in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for name, pred in rules:
        aggs.append(
            F.sum(
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias(name)
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{name}', `{name}`" for name in names)
    return row.select(
        F.expr(f"stack({len(names)}, {stack_args}) AS (rule, n_violations)"),
        F.col("__n_rows").alias("n_rows"),
    ).select(
        "rule",
        "n_rows",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


# --- registered form: the contract report over orders ---------------------

_DQ_SQL = """
WITH agg AS (
  SELECT COUNT(*) AS n_rows,
    CAST(SUM(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS status_known,
    CAST(SUM(CASE WHEN NOT coalesce(o_totalprice > 0.0, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS price_positive,
    CAST(SUM(CASE WHEN NOT coalesce(o_custkey IS NOT NULL, FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS custkey_not_null,
    CAST(SUM(CASE WHEN NOT coalesce(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS priority_format,
    CAST(SUM(CASE WHEN NOT coalesce(o_orderdate >= TIMESTAMP '1992-01-01'
                               AND o_orderdate < TIMESTAMP '1999-01-01', FALSE)
             THEN 1 ELSE 0 END) AS BIGINT) AS date_in_range
  FROM orders
)
SELECT 'status_known' AS rule, n_rows, status_known AS n_violations,
       status_known = 0 AS passed FROM agg
UNION ALL
SELECT 'price_positive', n_rows, price_positive, price_positive = 0 FROM agg
UNION ALL
SELECT 'custkey_not_null', n_rows, custkey_not_null, custkey_not_null = 0 FROM agg
UNION ALL
SELECT 'priority_format', n_rows, priority_format, priority_format = 0 FROM agg
UNION ALL
SELECT 'date_in_range', n_rows, date_in_range, date_in_range = 0 FROM agg
"""


def orders_contract_rules() -> list[tuple[str, Column]]:
    """The demo contract over the orders table — valid-predicates in
    quarantine's rule shape."""
    return [
        ("status_known", F.col("o_orderstatus").isin("O", "F", "P")),
        ("price_positive", F.col("o_totalprice") > 0.0),
        ("custkey_not_null", F.col("o_custkey").isNotNull()),
        ("priority_format", F.col("o_orderpriority").rlike("^[1-5]-")),
        (
            "date_in_range",
            (F.col("o_orderdate") >= F.lit("1992-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")),
        ),
    ]


@query("dq_expectations_report", _DQ_SQL)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """deequ-style contract check over orders: 5 invariants, one scan,
    (rule, n_rows, n_violations, passed) per invariant. The DuckDB
    oracle re-derives every conditional sum, so both the counting and
    the NULL-as-violation semantics are hash-verified."""
    o = ensure_parallelism(read_table(spark, sf_dir, "orders"))
    return expectations_report(o, orders_contract_rules())
