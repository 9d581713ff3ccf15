"""Delta-optional MERGE path (operators/delta_merge).

The container has no delta-spark, so the functional merge test is
skipped here and runs wherever the package exists; what IS always
tested is the gate itself — absence degrades to a clear ImportError at
wiring time (never on a live micro-batch) and the probe helpers stay
safe to call.
"""

from __future__ import annotations

import pytest

from fastetl_spark.operators.delta_merge import (
    delta_available,
    is_delta_table,
    merge_into_delta,
    require_delta,
)

needs_delta = pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
no_delta = pytest.mark.skipif(delta_available(), reason="gate tests need delta absent")


@no_delta
def test_gate_raises_clear_import_error(spark, tmp_path):
    with pytest.raises(ImportError, match="delta-spark"):
        require_delta()
    with pytest.raises(ImportError, match="delta-spark"):
        merge_into_delta(spark, str(tmp_path / "d"), None, ["id"])


@no_delta
def test_probe_is_safe_without_delta(spark, tmp_path):
    assert is_delta_table(spark, str(tmp_path / "nope")) is False


@no_delta
def test_engine_sync_delta_fails_at_wiring(spark, tmp_path):
    from fastetl_spark.api import Engine

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "2024-01-01")], "id long, ts string").write.parquet(src)
    with pytest.raises(ImportError, match="delta-spark"):
        Engine(spark).sync(
            {"path": src},
            {"path": str(tmp_path / "dst"), "format": "delta"},
            keys=["id"],
            watermark_col="ts",
        )


@no_delta
def test_foreach_batch_delta_fails_at_wiring(spark, tmp_path):
    from fastetl_spark.streaming.stream_ops import foreach_batch_merge

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )
    with pytest.raises(ImportError, match="delta-spark"):
        foreach_batch_merge(
            stream,
            dest_path=str(tmp_path / "dst"),
            keys=["value"],
            checkpoint_dir=str(tmp_path / "ckpt"),
            fmt="delta",
        )


@needs_delta
def test_merge_into_delta_upsert_and_delete(spark, tmp_path):
    """Runs only with delta-spark: MERGE semantics must equal the
    plain-parquet merge_upsert + delete_sync composition."""
    from pyspark.sql import functions as F

    from fastetl_spark.operators.sync import delete_sync, merge_upsert

    dest = str(tmp_path / "delta_dest")
    base = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, v string")
    inc = spark.createDataFrame([(5, "V5"), (11, "v11")], "id long, v string")
    dels = spark.createDataFrame([(3,)], "id long")

    merge_into_delta(spark, dest, base, ["id"])
    merge_into_delta(spark, dest, inc, ["id"], deleted_keys=dels)

    got = sorted(
        tuple(r) for r in spark.read.format("delta").load(dest).select("id", "v").collect()
    )
    expected_df = delete_sync(merge_upsert(base, inc, ["id"]), dels, ["id"])
    expected = sorted(tuple(r) for r in expected_df.select("id", "v").collect())
    assert got == expected
    assert (5, "V5") in got and (11, "v11") in got
    assert not any(r[0] == 3 for r in got)
    _ = F  # keep the functions import exercised for linters
