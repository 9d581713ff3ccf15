"""Bit-equality of the bucketed distributed prefix sum
(operators/ranks) against the single-partition window form it replaces
— the round-10 VERDICT ask: same numbers, zero Exchange
SinglePartition."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from fastetl_spark.operators.ranks import (
    bucket_of,
    bucketed_cum_sum,
    range_bounds,
)


def _window_ref(g, key, cnt, parts=(), inclusive=False):
    w = (
        Window.partitionBy(*parts)
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    return g.withColumn(
        "cum_ref", F.coalesce(F.sum(cnt).over(w), F.lit(0)).cast("long")
    )


def _support(spark, sf_dir, *cols):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("value").isNotNull() & ~F.isnan("value"))
    )
    return ev.groupBy(*cols).agg(F.count(F.lit(1)).cast("long").alias("cnt"))


def _assert_equal(got, key_cols):
    bad = got.filter(F.col("cum_below") != F.col("cum_ref")).count()
    assert bad == 0, f"{bad} rows diverge from the window form"


def test_global_exclusive_matches_window(spark, sf_dir):
    g = _support(spark, sf_dir, "value")
    bounds = range_bounds(g, "value")
    assert bounds == sorted(bounds)
    got = bucketed_cum_sum(g, "value", "cnt", bounds=bounds)
    ref = _window_ref(g, "value", "cnt").select("value", "cum_ref")
    _assert_equal(got.join(ref, "value"), ["value"])


def test_global_inclusive_matches_window(spark, sf_dir):
    g = _support(spark, sf_dir, "value")
    got = bucketed_cum_sum(
        g,
        "value",
        "cnt",
        bounds=range_bounds(g, "value"),
        inclusive=True,
        out_col="cum_below",
    )
    ref = _window_ref(g, "value", "cnt", inclusive=True).select(
        "value", "cum_ref"
    )
    _assert_equal(got.join(ref, "value"), ["value"])


def test_partitioned_matches_window(spark, sf_dir):
    g = _support(spark, sf_dir, "event_type", "value")
    got = bucketed_cum_sum(
        g,
        "value",
        "cnt",
        bounds=range_bounds(g, "value"),
        partition_cols=["event_type"],
    )
    ref = _window_ref(g, "value", "cnt", parts=["event_type"]).select(
        "event_type", "value", "cum_ref"
    )
    _assert_equal(got.join(ref, ["event_type", "value"]), ["value"])


def test_result_invariant_to_bucket_count(spark, sf_dir):
    # exactness must not depend on the split points — only balance does
    g = _support(spark, sf_dir, "value")
    a = bucketed_cum_sum(g, "value", "cnt", bounds=range_bounds(g, "value", 4))
    b = bucketed_cum_sum(g, "value", "cnt", bounds=[])
    j = a.select("value", F.col("cum_below").alias("ca")).join(
        b.select("value", F.col("cum_below").alias("cb")), "value"
    )
    assert j.filter(F.col("ca") != F.col("cb")).count() == 0


def test_timestamp_key(spark, sf_dir):
    g = _support(spark, sf_dir, "ts")
    got = bucketed_cum_sum(
        g, "ts", "cnt", bounds=range_bounds(g, "ts")
    )
    ref = _window_ref(g, "ts", "cnt").select("ts", "cum_ref")
    _assert_equal(got.join(ref, "ts"), ["ts"])


def test_bucket_of_is_monotone(spark):
    df = spark.range(0, 500).select(
        (F.col("id").cast("double") / 7.0).alias("k")
    )
    bounds = [10.0, 20.0, 20.0, 55.5]  # dup on purpose
    b = df.select(
        "k", bucket_of(F.col("k"), sorted(set(bounds))).alias("bkt")
    ).orderBy("k")
    rows = b.collect()
    assert all(
        rows[i]["bkt"] <= rows[i + 1]["bkt"] for i in range(len(rows) - 1)
    )


def test_empty_frame(spark):
    g = spark.createDataFrame([], "k double, cnt long")
    got = bucketed_cum_sum(g, "k", "cnt", bounds=[])
    assert got.count() == 0


def test_no_single_partition_exchange(spark, sf_dir):
    g = _support(spark, sf_dir, "value")
    got = bucketed_cum_sum(
        g, "value", "cnt", bounds=range_bounds(g, "value")
    )
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "simple"
    )
    assert "Exchange SinglePartition" not in plan


def test_precomputed_offsets_match_default_path(spark, sf_dir):
    from fastetl_spark.operators.ranks import (
        collect_bucket_totals,
        totals_to_offsets,
    )

    g = _support(spark, sf_dir, "event_type", "value")
    bounds = range_bounds(g, "value")
    totals = collect_bucket_totals(
        g, "value", "cnt", bounds=bounds, partition_cols=["event_type"]
    )
    a = bucketed_cum_sum(
        g, "value", "cnt", bounds=bounds, partition_cols=["event_type"]
    ).select("event_type", "value", F.col("cum_below").alias("ca"))
    b = bucketed_cum_sum(
        g,
        "value",
        "cnt",
        bounds=bounds,
        partition_cols=["event_type"],
        offsets=totals_to_offsets(totals, len(bounds) + 1),
    ).select("event_type", "value", F.col("cum_below").alias("cb"))
    j = a.join(b, ["event_type", "value"])
    assert j.filter(F.col("ca") != F.col("cb")).count() == 0
    assert j.count() == g.count()


def test_densified_offsets_carry_through_empty_buckets(spark):
    # group A occupies buckets 0 and 2 only; a grid-like frame has a
    # zero-count row in bucket 1 whose offset must still be carried
    # (a sparse offsets list would silently DROP it on the inner join)
    from fastetl_spark.operators.ranks import totals_to_offsets

    bounds = [10.0, 20.0]  # buckets: <=10, (10,20], >20
    g = spark.createDataFrame(
        [("A", 5.0, 3), ("A", 15.0, 0), ("A", 25.0, 7)],
        "grp string, k double, cnt long",
    )
    offs = totals_to_offsets([("A", 0, 3), ("A", 2, 7)], num_buckets=3)
    got = {
        r["k"]: r["cum_below"]
        for r in bucketed_cum_sum(
            g,
            "k",
            "cnt",
            bounds=bounds,
            partition_cols=["grp"],
            offsets=offs,
        ).collect()
    }
    assert got == {5.0: 0, 15.0: 3, 25.0: 3}


def test_string_key_cum_matches_window(spark, sf_dir):
    # the vocab rewrite's shape: within-count ASC term rank via the
    # byte-prefix string image — must match the window row_number
    from fastetl_spark.operators.ranks import materialize_with_bounds

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = (
        d.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    counts, bounds = materialize_with_bounds(counts, "term")
    got = bucketed_cum_sum(
        counts.withColumn("__one", F.lit(1).cast("long")),
        "term",
        "__one",
        bounds=bounds,
        partition_cols=["cnt"],
        inclusive=True,
        out_col="rk",
    )
    w = Window.partitionBy("cnt").orderBy("term")
    ref = counts.withColumn("rk_ref", F.row_number().over(w).cast("long"))
    j = got.join(ref.select("term", "rk_ref"), "term")
    assert j.filter(F.col("rk") != F.col("rk_ref")).count() == 0


def test_string_image_monotone_variable_length(spark):
    # "AZ" < "B" bytewise: unpadded prefixes would invert this pair
    from fastetl_spark.operators.ranks import _as_double
    from pyspark.sql.types import StringType

    df = spark.createDataFrame(
        [("A",), ("AZ",), ("B",), ("",), ("AAAAAAAAAA",), ("AAAAAAAAAB",)],
        "s string",
    )
    rows = (
        df.select("s", _as_double(F.col("s"), StringType()).alias("img"))
        .orderBy("s")
        .collect()
    )
    for i in range(len(rows) - 1):
        assert rows[i]["img"] <= rows[i + 1]["img"], (
            rows[i]["s"],
            rows[i + 1]["s"],
        )
