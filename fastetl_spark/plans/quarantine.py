"""Row-level validate-and-quarantine: the load-time reject channel.

The QA framework (plans/qa.py, reference patchwork.py:264-345) logs
per-CELL decisions for values it can repair; this plan handles the rows
that should not load at all — each validation rule tags its failures,
valid rows continue to the destination, rejects go to a quarantine
path with the full original row plus the list of failed rules (so a
fix-and-replay needs no re-derivation).

Shape: ONE scan, no joins — every rule is a column predicate evaluated
in the same projection; the failed-rule list is an array_compact over
per-rule WHEN expressions. At 100 TB the split is a filter on an
already-computed column, and both branches write in the same pass
(persist the tagged frame, or let the two sinks share the scan)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

FAILED_COL = "failed_rules"


def tag_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Add `failed_rules`: sorted array of the rule names whose
    predicate (True = valid) fails for the row. NULL predicate results
    count as failures — an unparseable value is not a valid one."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(pred, F.lit(False)), F.lit(name))
                for name, pred in rules
            ]
        )
    )
    return df.withColumn(FAILED_COL, F.array_sort(failed))


def validate_split(
    df: DataFrame, rules: list[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(valid_rows, rejects): valid rows drop the tag column; rejects
    keep row + failed rule names."""
    tagged = tag_rules(df, rules)
    valid = tagged.filter(F.size(FAILED_COL) == 0).drop(FAILED_COL)
    rejects = tagged.filter(F.size(FAILED_COL) > 0)
    return valid, rejects


_QUARANTINE_SQL = """
WITH tagged AS (
  SELECT o_orderkey,
         to_json(list_sort(list_filter([
           CASE WHEN NOT (o_orderstatus IN ('O', 'F')) THEN 'status_known' END,
           CASE WHEN NOT (o_orderdate < TIMESTAMP '1998-06-01') THEN 'date_bound' END,
           CASE WHEN NOT (o_totalprice > 1000.0) THEN 'min_price' END
         ], x -> x IS NOT NULL))) AS failed_rules
  FROM orders
)
SELECT o_orderkey, failed_rules FROM tagged WHERE failed_rules <> '[]'
"""


@query("quarantine_rejects", _QUARANTINE_SQL)
def quarantine_rejects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reject channel of a three-rule order validation (status domain,
    date bound, minimum price): key + the sorted failed-rule list as a
    JSON string (arrays crash pandas-side canonicalizers; strings
    hash)."""
    o = ensure_parallelism(read_table(spark, sf_dir, "orders"))
    rules = [
        ("status_known", F.col("o_orderstatus").isin("O", "F")),
        ("date_bound", F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")),
        ("min_price", F.col("o_totalprice") > 1000.0),
    ]
    _, rejects = validate_split(o, rules)
    return rejects.select(
        "o_orderkey", F.to_json(F.col(FAILED_COL)).alias("failed_rules")
    )
