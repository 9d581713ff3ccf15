"""time_interpolate_linear: interior interpolation stays inside the
bracket values, boundary probes yield NULL, and an exact-hit probe
returns the observed value exactly."""

from __future__ import annotations

import datetime

from fastetl_spark.operators.asof import time_interpolate_linear, _INTERP_PROBES
from fastetl_spark.io.readers import read_table
from pyspark.sql import functions as F


def test_interp_within_bracket_and_null_outside(spark, sf_dir):
    rows = time_interpolate_linear(spark, sf_dir).collect()
    assert rows
    n_interior = 0
    for r in rows:
        if r.prev_ts_us is None or r.next_ts_us is None:
            assert r.v_interp is None
        else:
            assert r.prev_ts_us <= r.next_ts_us
            n_interior += 1
    assert n_interior > 0


def test_exact_hit_returns_observed_value(spark, sf_dir):
    from pyspark.sql.window import Window

    base = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    # a user's EARLIEST event, from a user with >= 2 events: the probe at
    # its ts always has a strictly-later bracket partner
    w = Window.partitionBy("user_id").orderBy("ts")
    ev = (
        base.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("user_id")))
        .filter((F.col("rn") == 1) & (F.col("n") >= 2))
        .limit(1)
        .collect()[0]
    )
    # monkey-probe: recompute with the probe equal to a real event ts
    import fastetl_spark.operators.asof as asof_mod

    saved = asof_mod._INTERP_PROBES
    try:
        asof_mod._INTERP_PROBES = [ev.ts.strftime("%Y-%m-%d %H:%M:%S.%f")]
        # rebuild the function's probe array via module constant
        out = {
            (r.user_id): r.v_interp
            for r in _rebuilt(spark, sf_dir).collect()
            if r.user_id == ev.user_id
        }
    finally:
        asof_mod._INTERP_PROBES = saved
    # probe == observed ts -> weight collapses to the observed value
    assert abs(out[ev.user_id] - ev.value) < 1e-12


def _rebuilt(spark, sf_dir):
    # call through the module so the patched probe list is picked up
    import fastetl_spark.operators.asof as asof_mod

    return asof_mod.time_interpolate_linear(spark, sf_dir)
