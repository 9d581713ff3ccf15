"""Behavior tests for the analytics operators (the three oracle-backed
queries are additionally swept by test_queries_vs_duckdb.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.operators.analytics import (
    _KMEANS_K,
    embedding_kmeans_clusters,
    event_value_histogram,
    robust_outlier_events,
    source_reputation_report,
)


def test_kmeans_partitions_the_corpus(spark, sf_dir):
    n_vecs = read_table(spark, sf_dir, "embeddings").count()
    rows = embedding_kmeans_clusters(spark, sf_dir).collect()
    assert 1 <= len(rows) <= _KMEANS_K
    # every vector lands in exactly one cluster
    assert sum(r.n_members for r in rows) == n_vecs
    # cosine of a member to its own centroid is bounded
    assert all(-1.000001 <= r.mean_sim <= 1.000001 for r in rows)


def test_kmeans_deterministic(spark, sf_dir):
    a = sorted(map(tuple, embedding_kmeans_clusters(spark, sf_dir).collect()))
    b = sorted(map(tuple, embedding_kmeans_clusters(spark, sf_dir).collect()))
    assert a == b


def test_source_report_totals(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents")
    rows = source_reputation_report(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == d.count()
    assert all(r.dup_docs >= 0 and r.short_docs <= r.n_docs for r in rows)


def test_outlier_counts_bounded(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    rows = robust_outlier_events(spark, sf_dir).collect()
    assert sum(r.n for r in rows) == e.count()
    # MAD-based outliers are a minority by construction
    assert all(r.n_outliers < r.n for r in rows)
    assert all(r.mad >= 0.0 for r in rows)


def test_histogram_partitions_values(spark, sf_dir):
    e = read_table(spark, sf_dir, "events")
    h = event_value_histogram(spark, sf_dir)
    assert h.agg(F.sum("n")).first()[0] == e.count()
    bad = h.filter(
        (F.col("min_v") < F.col("bucket") * 10.0)
        | (F.col("max_v") >= (F.col("bucket") + 1) * 10.0)
    )
    assert bad.count() == 0


def test_approx_quantiles_near_exact(spark, sf_dir):
    from fastetl_spark.operators.analytics import approx_quantiles_events

    e = read_table(spark, sf_dir, "events")
    exact = {
        (r["event_type"], q): r["v"]
        for q in (0.5, 0.9, 0.99)
        for r in e.groupBy("event_type")
        .agg(F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY value)").alias("v"))
        .collect()
    }
    spread = (
        e.groupBy("event_type")
        .agg((F.max("value") - F.min("value")).alias("s"))
        .collect()
    )
    spread = {r["event_type"]: r["s"] for r in spread}
    rows = approx_quantiles_events(spark, sf_dir).collect()
    assert len(rows) == 3 * len(spread)
    for r in rows:
        # sketch accuracy 1/10000: at test sizes the answer is near-exact
        assert abs(r.approx_value - exact[(r.event_type, r.q)]) <= 0.01 * spread[r.event_type]


def test_fuzzy_pairs_are_bounded_and_ordered(spark, sf_dir):
    from fastetl_spark.operators.matching import fuzzy_name_pairs

    rows = fuzzy_name_pairs(spark, sf_dir).collect()
    assert rows, "dictionary should contain near-identical names"
    assert all(r.name_a < r.name_b and 1 <= r.dist <= 4 for r in rows)


def test_merge_partial_aggs_handles_delta_only_keys(spark):
    from fastetl_spark.operators.sync import merge_partial_aggs

    base = spark.createDataFrame(
        [("a", 2, 10.0), ("b", 1, 5.0)], "k string, n_orders long, total double"
    )
    delta = spark.createDataFrame(
        [("b", 3, 7.0), ("c", 1, 1.0)], "k string, n_orders long, total double"
    )
    got = {
        r.k: (r.n_orders, r.total)
        for r in merge_partial_aggs(base, delta, ["k"]).collect()
    }
    assert got == {"a": (2, 10.0), "b": (4, 12.0), "c": (1, 1.0)}


def test_checksum_detects_single_row_mutation(spark, sf_dir):
    from fastetl_spark.operators.sync import table_checksum

    o = read_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_orderstatus", "o_orderpriority"]
    mutated = o.withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") == 7, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    a = {r.bucket: (r.n_rows, r.checksum) for r in table_checksum(o, "o_orderkey", cols).collect()}
    b = {r.bucket: (r.n_rows, r.checksum) for r in table_checksum(mutated, "o_orderkey", cols).collect()}
    diff = {k for k in a if a[k] != b[k]}
    # exactly the bucket containing key 7 flags; row counts agree everywhere
    assert diff == {0}
    assert all(a[k][0] == b[k][0] for k in a)


def test_hll_rollup_near_exact(spark, sf_dir):
    from fastetl_spark.operators.analytics import hll_weekly_users_rollup

    e = read_table(spark, sf_dir, "events")
    exact = {
        r["week"]: r["n"]
        for r in e.groupBy(F.date_trunc("week", F.col("ts")).alias("week"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rows = hll_weekly_users_rollup(spark, sf_dir).collect()
    assert {r["week"] for r in rows} == set(exact)
    for r in rows:
        # HLL default precision: well under 5% at any cardinality
        assert abs(r["est_users"] - exact[r["week"]]) <= max(2, 0.05 * exact[r["week"]])


def test_landing_datasource_roundtrip(spark, tmp_path):
    import json

    from fastetl_spark.io.landing_source import LandingDataSource

    spark.dataSource.register(LandingDataSource)
    stage = tmp_path / "stage"
    stage.mkdir()
    for i in range(3):
        with open(stage / f"chunk{i}.jsonl", "w") as fh:
            for j in range(5):
                fh.write(json.dumps({"name": f"r{i}-{j}", "qty": i * 10 + j}) + "\n")

    df = (
        spark.read.format("fastetl_landing")
        .schema("name string, qty bigint")
        .option("path", str(stage))
        .load()
    )
    # one partition per chunk: executor-side fetch, no driver funnel
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 15

    out = tmp_path / "out"
    df.write.format("fastetl_landing").mode("overwrite").option("path", str(out)).save()
    back = (
        spark.read.format("fastetl_landing")
        .schema("name string, qty bigint")
        .option("path", str(out))
        .load()
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_validate_split_partitions_rows(spark, sf_dir):
    from fastetl_spark.plans.quarantine import validate_split

    o = read_table(spark, sf_dir, "orders")
    rules = [
        ("status_known", F.col("o_orderstatus").isin("O", "F")),
        ("min_price", F.col("o_totalprice") > 1000.0),
    ]
    valid, rejects = validate_split(o, rules)
    assert valid.count() + rejects.count() == o.count()
    # every reject names at least one rule; null predicates reject
    assert rejects.filter(F.size("failed_rules") == 0).count() == 0
    bad_status = o.filter(~F.col("o_orderstatus").isin("O", "F")).count()
    assert (
        rejects.filter(F.array_contains("failed_rules", "status_known")).count()
        == bad_status
    )


def test_validate_split_null_predicate_rejects(spark):
    from fastetl_spark.plans.quarantine import validate_split

    df = spark.createDataFrame([(1, None), (2, 5.0)], "id long, v double")
    valid, rejects = validate_split(df, [("v_pos", F.col("v") > 0)])
    assert [r.id for r in valid.collect()] == [2]
    assert [r.id for r in rejects.collect()] == [1]


def test_schema_diff_and_breaking_gate(spark):
    import pytest
    from pyspark.sql import types as T

    from fastetl_spark.meta.schema_diff import assert_no_breaking_drift, schema_diff

    old = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    new = T.StructType(
        [
            T.StructField("ID", T.LongType()),  # case-insensitive match
            T.StructField("price", T.StringType()),  # type change
            T.StructField("added_at", T.TimestampType()),  # addition
        ]
    )
    kinds = {(c.kind, c.column) for c in schema_diff(old, new)}
    assert kinds == {
        ("added", "added_at"),
        ("removed", "name"),
        ("type_changed", "price"),
    }
    with pytest.raises(ValueError, match="breaking schema drift"):
        assert_no_breaking_drift(old, new)
    benign = assert_no_breaking_drift(old, T.StructType(list(old.fields) + [T.StructField("x", T.LongType())]))
    assert [c.kind for c in benign] == ["added"]


def test_landing_datasource_empty_dir_is_empty_frame(spark, tmp_path):
    from fastetl_spark.io.landing_source import LandingDataSource

    spark.dataSource.register(LandingDataSource)
    empty = tmp_path / "empty_stage"
    empty.mkdir()
    df = (
        spark.read.format("fastetl_landing")
        .schema("a long")
        .option("path", str(empty))
        .load()
    )
    assert df.count() == 0


def test_landing_stream_reader_incremental(spark, tmp_path):
    import json

    from fastetl_spark.io.landing_source import LandingDataSource

    spark.dataSource.register(LandingDataSource)
    stage = tmp_path / "stream_stage"
    stage.mkdir()

    def land(seq, rows):
        with open(stage / f"part-{seq:04d}.jsonl", "w") as fh:
            for r in rows:
                fh.write(json.dumps(r) + "\n")

    land(0, [{"name": "a", "qty": 1}, {"name": "b", "qty": 2}])
    land(1, [{"name": "c", "qty": 3}])

    dest = str(tmp_path / "dest")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("fastetl_landing")
        .schema("name string, qty bigint")
        .option("path", str(stage))
        .load()
    )
    q = stream.writeStream.format("parquet").option("path", dest).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert spark.read.parquet(dest).count() == 3

    # wave 2: only the new chunk flows on restart from the checkpoint
    land(2, [{"name": "d", "qty": 4}])
    stream2 = (
        spark.readStream.format("fastetl_landing")
        .schema("name string, qty bigint")
        .option("path", str(stage))
        .load()
    )
    q2 = stream2.writeStream.format("parquet").option("path", dest).option(
        "checkpointLocation", ckpt
    ).trigger(availableNow=True).start()
    q2.awaitTermination(120)
    got = sorted(
        (r["name"], r["qty"]) for r in spark.read.parquet(dest).collect()
    )
    assert got == [("a", 1), ("b", 2), ("c", 3), ("d", 4)]


def test_count_min_never_underestimates(spark, sf_dir):
    from fastetl_spark.operators.analytics import count_min_error_profile

    rows = count_min_error_profile(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.cms_estimate >= r.true_count  # CMS one-sided guarantee
        assert r.overestimate == r.cms_estimate - r.true_count


def test_hll_portable_estimate_sane(spark, sf_dir):
    from fastetl_spark.operators.analytics import hll_portable_estimate, _HLL_M

    rows = hll_portable_estimate(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_empty <= _HLL_M
        assert r.harmonic_scaled >= _HLL_M * (1 << 5)  # every rank <= 27
        # raw HLL (no small-range correction) is within its coarse band
        assert 0.3 * r.n_true <= r.hll_raw_estimate <= 3.5 * r.n_true


def test_spc_flags_synthetic_spike(spark):
    import math

    # 10 quiet days at 100 plus one 300-spike: way past 3 sigma
    vals = [100] * 10 + [300]
    n = len(vals)
    s, a = sum(vals), sum(v * v for v in vals)
    mean = s / n
    std = math.sqrt((n * a - s * s) / (n * (n - 1)))
    assert abs(300 - mean) > 3 * std  # the spike really is out of control

    daily = spark.createDataFrame(
        [("t", i, v) for i, v in enumerate(vals)], "event_type string, day long, x long"
    )
    from pyspark.sql import functions as F

    from fastetl_spark.operators.analytics import spc_out_of_control

    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("a"),
    )
    flagged = {
        r.day
        for r in daily.join(stats, "event_type")
        .filter(spc_out_of_control(F.col("x"), F.col("n"), F.col("s"), F.col("a")))
        .collect()
    }
    assert flagged == {10}  # only the spike day


def test_fd_profile_null_semantics_pinned(spark):
    # r10 ADVICE: a NULL on either side must not count as a mapping —
    # Spark countDistinct and DuckDB struct-DISTINCT disagree there, so
    # the operator filters both-present rows explicitly.  a=1 maps only
    # to 'x' among complete rows: the FD HOLDS despite the NULL rows.
    from fastetl_spark.operators.analytics import fd_profile

    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, None), (None, "y"), (2, None)],
        "a int, b string",
    )
    rows = {(r["lhs"], r["rhs"]): r for r in fd_profile(df, [("a", "b")]).collect()}
    r = rows[("a", "b")]
    assert r["n_lhs"] == 1 and r["n_pairs"] == 1
    assert r["holds"] is True and r["extra_mappings"] == 0


def test_fd_profile_duckdb_agrees_on_nulls(spark):
    # the SAME pinned filter in SQL: both engines now agree on a
    # NULL-bearing frame (this was the latent divergence)
    import duckdb

    from fastetl_spark.operators.analytics import fd_profile

    data = [(1, "x"), (1, "y"), (1, None), (None, "y"), (2, "z"), (2, "z")]
    df = spark.createDataFrame(data, "a int, b string")
    got = {
        (r["lhs"], r["rhs"]): (r["n_lhs"], r["n_pairs"], r["holds"])
        for r in fd_profile(df, [("a", "b")]).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a int, b varchar)")
    con.executemany("INSERT INTO t VALUES (?, ?)", data)
    n_lhs, n_pairs = con.execute(
        "SELECT COUNT(DISTINCT a), COUNT(DISTINCT (a, b)) FROM t"
        " WHERE a IS NOT NULL AND b IS NOT NULL"
    ).fetchone()
    assert got[("a", "b")] == (n_lhs, n_pairs, n_lhs == n_pairs)
