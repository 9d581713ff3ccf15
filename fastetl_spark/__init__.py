"""fastetl_spark — a PySpark-native analytics/ETL engine.

Re-expresses the capabilities of the reference ETL package
(economiagovbr/fastETL, studied at /root/reference) on Spark
DataFrame/SQL primitives, designed for 100 TB scale:

- ``io``         readers/writers (parquet/CSV/JDBC partitioned scans) + type mapping
- ``operators``  copy/sync/dedup/similarity/text/sessionize ops
- ``functions``  column-expression cleaners (decimal-comma, CPF, UF, crop, ...)
- ``plans``      QA-log framework, patch overlay / merge_patches
- ``streaming``  Structured Streaming variants (windowed aggs, foreachBatch merge)
- ``meta``       load-log, table/column comments propagation, data dictionary

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE; Python UDFs are avoided in hot paths.
"""

from fastetl_spark.session import get_spark


def engine(spark=None, **kwargs):
    """Convenience constructor for the high-level facade:
    ``fastetl_spark.engine()`` -> api.Engine on a default session.
    Imported lazily so ``import fastetl_spark`` stays cheap."""
    from fastetl_spark.api import Engine

    return Engine(spark or get_spark(), **kwargs)


__all__ = ["engine", "get_spark"]
__version__ = "0.1.0"
