"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query (pricing summary) on sf0.001.
queries()    — every implemented operator from SURVEY.md §2 + the
               LLM-data extension, as (spark, sf_dir) -> DataFrame.
oracle_sql() — matching DuckDB SQL; keys without an oracle are
               engine-hash-based ops checked rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from fastetl_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from fastetl_spark import registry

    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    from fastetl_spark import registry

    registry.load_all()
    return dict(registry.ORACLES)
