"""Query/oracle registry.

Every operator module registers its demonstration queries here via the
``@query`` decorator. ``__spark_entry__.py`` re-exports QUERIES/ORACLES
for the driver harness: each query is a (spark, sf_dir) -> DataFrame
callable; each oracle is the equivalent DuckDB SQL over the same parquet
tables. Column names/aliases MUST match between the two — the driver
sorts columns by name before hashing values.

Determinism rule used throughout: any float that is *derived* by
aggregation is computed through exact DECIMAL arithmetic and only cast
to DOUBLE at the end (identical digits in Spark and DuckDB regardless
of partition/accumulation order); floats merely *passed through* from
parquet are bit-identical anyway.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle=None`` marks a non-SQL-expressible op
    (driver records a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import fastetl_spark.operators.ann_eval  # noqa: F401
    import fastetl_spark.operators.ann_index  # noqa: F401
    import fastetl_spark.operators.bloomjoin  # noqa: F401
    import fastetl_spark.operators.asof  # noqa: F401
    import fastetl_spark.operators.graph  # noqa: F401
    import fastetl_spark.operators.ivm  # noqa: F401
    import fastetl_spark.operators.kmeans  # noqa: F401
    import fastetl_spark.operators.packing  # noqa: F401
    import fastetl_spark.operators.rank_quantiles  # noqa: F401
    import fastetl_spark.operators.lateral_udtf  # noqa: F401
    import fastetl_spark.operators.relational  # noqa: F401
    import fastetl_spark.operators.relational2  # noqa: F401
    import fastetl_spark.operators.relational3  # noqa: F401
    import fastetl_spark.operators.relational4  # noqa: F401
    import fastetl_spark.operators.relational5  # noqa: F401
    import fastetl_spark.operators.sync  # noqa: F401
    import fastetl_spark.operators.cleaning_queries  # noqa: F401
    import fastetl_spark.operators.curation  # noqa: F401
    import fastetl_spark.operators.curation2  # noqa: F401
    import fastetl_spark.operators.features  # noqa: F401
    import fastetl_spark.operators.dedup  # noqa: F401
    import fastetl_spark.operators.similarity  # noqa: F401
    import fastetl_spark.operators.text  # noqa: F401
    import fastetl_spark.operators.text2  # noqa: F401
    import fastetl_spark.operators.text3  # noqa: F401
    import fastetl_spark.operators.heavy_hitters  # noqa: F401
    import fastetl_spark.operators.retrieval  # noqa: F401
    import fastetl_spark.operators.vector_sketch  # noqa: F401
    import fastetl_spark.operators.sampling  # noqa: F401
    import fastetl_spark.operators.analytics  # noqa: F401
    import fastetl_spark.operators.matching  # noqa: F401
    import fastetl_spark.operators.partitioning  # noqa: F401
    import fastetl_spark.operators.sessionize  # noqa: F401
    import fastetl_spark.operators.spatial  # noqa: F401
    import fastetl_spark.operators.multimodal  # noqa: F401
    import fastetl_spark.operators.evaluation  # noqa: F401
    import fastetl_spark.meta.profile  # noqa: F401
    import fastetl_spark.operators.dedup_index  # noqa: F401
    import fastetl_spark.plans.curation_pipeline  # noqa: F401
    import fastetl_spark.streaming.stream_ops  # noqa: F401
    import fastetl_spark.plans.patch  # noqa: F401
    import fastetl_spark.plans.expectations  # noqa: F401
    import fastetl_spark.plans.quarantine  # noqa: F401
