"""Column-level table profiling — the statistics a data dictionary or
ingestion QA gate needs (null rates, cardinality, value ranges), as ONE
aggregation pass per table.

The reference derives its data dictionary from schema metadata only
(odf_tables.py); profiling adds the content-level facts a 100 TB lake
needs before a load is trusted. All columns' aggregates run in a single
job (one scan, map-side partial aggregation); the wide 1-row result is
unpivoted driver-side to the long (column, metric) form — |columns|
cells, not data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile: nulls, exact distinct count, min/max (as
    strings for a uniform schema). One scan; for a quick pass on huge
    data swap count_distinct for approx_count_distinct at the call
    site."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            F.count_distinct(c).alias(f"{c}__nd"),
            # min/max over the NATIVE type, cast after — a string-cast
            # min/max would order numerics lexicographically
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (
            c,
            row["__n"] - row[f"{c}__nn"],
            row[f"{c}__nd"],
            row[f"{c}__min"],
            row[f"{c}__max"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out, "col_name string, n_nulls long, n_distinct long, min_value string, max_value string"
    )


_PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")

_PROFILE_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS col_name,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_value,
       CAST(MAX({c}) AS VARCHAR) AS max_value
FROM orders"""
    for c in _PROFILE_COLS
)


@query("table_profile", _PROFILE_SQL)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile of the orders table's key/status columns (floats and
    timestamps excluded from the demo query only because engines format
    them differently as strings; profile() itself takes any column)."""
    o = read_table(spark, sf_dir, "orders")
    return profile(o, list(_PROFILE_COLS))
