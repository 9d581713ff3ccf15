"""Bucketed shuffle-free joins, salted skew joins, and the custom
stateful streaming operator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.operators.partitioning import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    o = read_table(spark, sf_dir, "orders")
    l = read_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    write_bucketed(o, "b_orders", "o_orderkey", 8)
    write_bucketed(l, "b_lineitem", "o_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange" not in plan  # co-located: no shuffle at all
        assert joined.count() == read_table(spark, sf_dir, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark, sf_dir):
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_quantity")
    s = read_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    plain = l.join(s, "l_suppkey")
    salted = salted_join(l, s, "l_suppkey", salt_n=4)
    assert salted.count() == plain.count()
    a = plain.groupBy("l_suppkey").count().collect()
    b = salted.groupBy("l_suppkey").count().collect()
    assert {(r.l_suppkey, r["count"]) for r in a} == {(r.l_suppkey, r["count"]) for r in b}


def test_running_user_totals_stateful(spark, sf_dir, tmp_path):
    from fastetl_spark.streaming.stateful import running_user_totals
    from fastetl_spark.streaming.stream_ops import read_events_stream

    events_path = tmp_path / "events"
    read_table(spark, sf_dir, "events").repartition(3).write.parquet(str(events_path))
    stream = read_events_stream(spark, str(events_path), max_files_per_trigger=1)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update-mode memory sink holds one row per (user, update); the last
    # update per user must equal the batch totals
    got = spark.sql(
        """
        SELECT user_id, MAX(n_events) AS n_events
        FROM user_totals GROUP BY user_id
        """
    )
    expected = (
        spark.read.parquet(str(events_path)).groupBy("user_id").agg(F.count("*").alias("n"))
    )
    g = {r.user_id: r.n_events for r in got.collect()}
    e = {r.user_id: r.n for r in expected.collect()}
    assert g == e


def test_running_user_totals_transform_with_state(spark, sf_dir, tmp_path):
    """Spark-4 transformWithStateInPandas twin converges to the same
    totals as the batch aggregate (and hence as the older
    applyInPandasWithState operator)."""
    import pytest

    pytest.importorskip("google.protobuf", reason="transformWithState needs protobuf")
    from fastetl_spark.streaming.stateful import running_user_totals_tws
    from fastetl_spark.streaming.stream_ops import read_events_stream

    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        events_path = tmp_path / "events"
        read_table(spark, sf_dir, "events").repartition(3).write.parquet(str(events_path))
        stream = read_events_stream(spark, str(events_path), max_files_per_trigger=1)
        q = (
            running_user_totals_tws(stream)
            .writeStream.format("memory")
            .queryName("user_totals_tws")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql(
            "SELECT user_id, MAX(n_events) AS n_events FROM user_totals_tws GROUP BY user_id"
        )
        expected = (
            spark.read.parquet(str(events_path)).groupBy("user_id").agg(F.count("*").alias("n"))
        )
        g = {r.user_id: r.n_events for r in got.collect()}
        e = {r.user_id: r.n for r in expected.collect()}
        assert g == e
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)

