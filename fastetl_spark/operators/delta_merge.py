"""Delta-backed transactional MERGE — the lakehouse path SURVEY §4.3
calls for, behind an import gate.

When the `delta` package is importable (Delta Lake on a real cluster),
the incremental sync (§2.9, reference fast_etl.py:454-652) and the
streaming foreachBatch merge can route through ONE ``MERGE INTO``: the
transaction log gives cross-file atomicity, file-level pruning does the
partial-rewrite work the bucketed layout (io/bucketed) does by hand,
and concurrent readers never see a half-published merge. Without the
package, callers fall back to the bucketed/atomic-swap plain-parquet
paths — no hard dependency, same results.

This container does not ship `delta`, so the test for this module is
skipped here (same gating pattern as the protobuf-gated
transformWithStateInPandas twin); the code paths are exercised wherever
the package exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def delta_available() -> bool:
    """True when the Delta Lake python bindings are importable."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def require_delta() -> None:
    if not delta_available():
        raise ImportError(
            "delta-spark is not installed; use the bucketed plain-parquet "
            "merge (io/bucketed) or install delta-spark for MERGE INTO"
        )


def is_delta_table(spark: SparkSession, path: str) -> bool:
    """True when `path` is an existing Delta table (gated: False when
    the package is absent, so probe-then-fallback callers stay safe)."""
    if not delta_available():
        return False
    from delta.tables import DeltaTable

    return DeltaTable.isDeltaTable(spark, path)


def merge_into_delta(
    spark: SparkSession,
    dest_path: str,
    increment: DataFrame,
    keys: list[str],
    deleted_keys: DataFrame | None = None,
) -> None:
    """One transactional MERGE INTO: update-on-match + insert-on-miss
    (upsert semantics identical to operators/sync.merge_upsert /
    reference fast_etl.py:437-451), plus key-deletes when a deletion
    feed is given. First call creates the table (initial full load).

    At scale this is the preferred §2.9 destination: the Delta log
    prunes the merge to the files containing matched keys (the same
    O(|increment|) property io/bucketed.partial_merge provides for
    plain parquet) and commits atomically across all of them.
    """
    require_delta()
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, dest_path):
        increment.write.format("delta").mode("overwrite").save(dest_path)
        if deleted_keys is not None:
            _delete_keys(spark, dest_path, deleted_keys, keys)
        return

    dt = DeltaTable.forPath(spark, dest_path)
    cond = " AND ".join(f"d.{k} <=> s.{k}" for k in keys)
    (
        dt.alias("d")
        .merge(increment.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    if deleted_keys is not None:
        _delete_keys(spark, dest_path, deleted_keys, keys)


def _delete_keys(
    spark: SparkSession, dest_path: str, deleted_keys: DataFrame, keys: list[str]
) -> None:
    from delta.tables import DeltaTable

    dt = DeltaTable.forPath(spark, dest_path)
    cond = " AND ".join(f"d.{k} <=> s.{k}" for k in keys)
    (
        dt.alias("d")
        .merge(deleted_keys.select(*keys).alias("s"), cond)
        .whenMatchedDelete()
        .execute()
    )
