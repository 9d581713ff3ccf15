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


def test_null_group_key_rows_survive(spark):
    # r11 ADVICE (medium): a NULL group key is a legitimate GROUP BY
    # group — the offset join must be null-safe, not drop the rows
    g = spark.createDataFrame(
        [("A", 1.0, 2), ("A", 3.0, 1), (None, 2.0, 5), (None, 4.0, 1)],
        "grp string, k double, cnt long",
    )
    got = bucketed_cum_sum(
        g, "k", "cnt", bounds=[2.5], partition_cols=["grp"]
    )
    assert got.count() == 4, "NULL-group rows vanished from the join"
    ref = _window_ref(g, "k", "cnt", parts=["grp"])
    j = got.join(
        ref.select("grp", "k", "cum_ref"),
        [got["grp"].eqNullSafe(ref["grp"]), got["k"] == ref["k"]],
    )
    assert j.filter(F.col("cum_below") != F.col("cum_ref")).count() == 0


def test_timestamp_key_monotone_under_dst_tz(spark):
    # r11 ADVICE (low): the TIMESTAMP image must be tz-free.  Under a
    # DST fall-back session timezone the old calendar-field form
    # inverted instants around the transition; unix_micros cannot.
    import datetime as dt

    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # US fall-back 2024-11-03 06:00 UTC: local wall clock repeats
        # 01:00-02:00.  Instants straddling the transition, 20 min apart.
        base = dt.datetime(2024, 11, 3, 4, 30, tzinfo=dt.timezone.utc)
        rows = [
            (base + dt.timedelta(minutes=20 * i), 1)
            for i in range(12)
        ]
        g = spark.createDataFrame(rows, "ts timestamp, cnt long")
        got = bucketed_cum_sum(
            g, "ts", "cnt", bounds=range_bounds(g, "ts", 8)
        )
        ref = _window_ref(g, "ts", "cnt").select("ts", "cum_ref")
        _assert_equal(got.join(ref, "ts"), ["ts"])
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_skew_one_hot_support(spark):
    # one key carries ~all the mass; the rest are singletons
    rows = [(0.0, 1_000_000)] + [(float(i), 1) for i in range(1, 200)]
    g = spark.createDataFrame(rows, "k double, cnt long")
    got = bucketed_cum_sum(g, "k", "cnt", bounds=range_bounds(g, "k", 16))
    ref = _window_ref(g, "k", "cnt").select("k", "cum_ref")
    _assert_equal(got.join(ref, "k"), ["k"])


def test_skew_all_equal_keys(spark):
    # a single distinct key per group: bounds collapse, bucket 0 only
    g = spark.createDataFrame(
        [("A", 7.0, 5), ("B", 7.0, 3), ("C", 7.0, 11)],
        "grp string, k double, cnt long",
    )
    bounds = range_bounds(g, "k", 16)
    got = bucketed_cum_sum(
        g, "k", "cnt", bounds=bounds, partition_cols=["grp"], inclusive=True
    )
    vals = {r["grp"]: r["cum_below"] for r in got.collect()}
    assert vals == {"A": 5, "B": 3, "C": 11}


def test_skew_multibyte_utf8_string_keys(spark):
    # multi-byte code points must keep byte order through the 7-byte
    # prefix image (Spark compares strings bytewise)
    from fastetl_spark.operators.ranks import materialize_with_bounds

    words = ["a", "ação", " açaí", "z", "Ωmega", "ωmega", "日本語",
             "日本", "émigré", "e", "é", "é", "ß", "ss"]
    g = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(words)], "k string, cnt long"
    )
    g2, bounds = materialize_with_bounds(g, "k", 8)
    got = bucketed_cum_sum(g2, "k", "cnt", bounds=bounds)
    ref = _window_ref(g2, "k", "cnt").select("k", "cum_ref")
    _assert_equal(got.join(ref, "k"), ["k"])


def test_offset_boundedness_contract_enforced(spark):
    # r11 VERDICT ask #1b: an unbounded group column fails loudly
    import pytest

    from fastetl_spark.operators.ranks import collect_bucket_totals

    g = spark.range(0, 500).select(
        F.col("id").alias("grp"),
        (F.col("id") % 7).cast("double").alias("k"),
        F.lit(1).cast("long").alias("cnt"),
    )
    with pytest.raises(RuntimeError, match="max_offset_rows"):
        bucketed_cum_sum(
            g, "k", "cnt", bounds=[2.0, 4.0], partition_cols=["grp"],
            max_offset_rows=100,
        )
    with pytest.raises(RuntimeError, match="max_offset_rows"):
        collect_bucket_totals(
            g, "k", "cnt", bounds=[2.0, 4.0], partition_cols=["grp"],
            max_offset_rows=100,
        )
    # precomputed offsets are guarded too
    with pytest.raises(RuntimeError, match="max_offset_rows"):
        bucketed_cum_sum(
            g, "k", "cnt", bounds=[], partition_cols=["grp"],
            offsets=[(i, 0, 0) for i in range(500)], max_offset_rows=100,
        )


def test_adaptive_num_buckets_default(spark):
    # num_buckets=None adapts to the cluster; floor keeps this box at
    # the r11 fixed value so existing plans and hashes are unchanged
    from fastetl_spark.operators.ranks import default_num_buckets

    nb = default_num_buckets(spark)
    assert 64 <= nb <= 1024
    g = spark.range(0, 1000).select(
        (F.col("id") % 97).cast("double").alias("k"),
        F.lit(1).cast("long").alias("cnt"),
    ).groupBy("k").agg(F.sum("cnt").alias("cnt"))
    got = bucketed_cum_sum(g, "k", "cnt", bounds=range_bounds(g, "k"))
    ref = _window_ref(g, "k", "cnt").select("k", "cum_ref")
    _assert_equal(got.join(ref, "k"), ["k"])


def test_infinite_keys_share_edge_buckets(spark):
    """+/-inf keys must not crash the Bucketizer path: percentile_approx
    can return infinite split points, which would collide with the
    [-inf, *bounds, +inf] sentinels (strictly-increasing-splits
    IllegalArgumentException — the r12 ADVICE finding).  Non-finite
    values are dropped from the bounds; infinite keys simply share the
    edge buckets, and the cum sums stay exact."""
    inf = float("inf")
    rows = [(-inf, 1), (1.0, 2), (2.0, 3), (3.0, 4), (inf, 5), (inf, 0)]
    g = (
        spark.createDataFrame(rows, "k double, cnt long")
        .groupBy("k")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    bounds = range_bounds(g, "k", num_buckets=4)
    assert all(b == b and abs(b) != float("inf") for b in bounds)
    got = _window_ref(
        bucketed_cum_sum(g, "k", "cnt", bounds=bounds), "k", "cnt"
    )
    _assert_equal(got, ["k"])


def test_common_prefix_string_keys_spread_and_stay_exact(spark):
    """URL-style corpora share >= 7 leading bytes, which collapses the
    ABSOLUTE first-7-bytes image to one double — split points
    degenerate and the whole frame lands in a single bucket (the r12
    VERDICT finding).  materialize_with_bounds now strips the global
    common prefix (min/max ride the same observe), so the buckets
    spread again; the cum sums stay bit-equal to the window form."""
    from pyspark.sql.types import StringType

    from fastetl_spark.operators.ranks import (
        _BKT,
        _as_double,
        _with_bucket,
        materialize_with_bounds,
    )

    g = (
        spark.range(2000)
        .select(
            F.concat(
                F.lit("https://example.com/"),
                F.md5(F.col("id").cast("string")),
            ).alias("k"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
    )
    g2, bounds = materialize_with_bounds(g, "k", num_buckets=64)
    assert bounds.prefix == b"https://example.com/"
    assert len(bounds) > 8  # split points no longer degenerate
    kd = _as_double(F.col("k"), StringType(), bounds.prefix)
    n_buckets_used = _with_bucket(g2, kd, bounds).select(_BKT).distinct().count()
    assert n_buckets_used > 8  # was exactly 1 with the absolute image
    got = _window_ref(
        bucketed_cum_sum(g2, "k", "cnt", bounds=bounds), "k", "cnt"
    )
    _assert_equal(got, ["k"])


def test_prefix_strip_preserves_order_for_out_of_prefix_keys(spark):
    """The stripped image must stay TOTAL and monotone even for keys
    that do NOT share the bounds frame's prefix (assignment frame !=
    bounds frame): they clamp to sentinel images below/above the
    shared-prefix block, so ordering never inverts and the prefix sum
    stays exact."""
    from fastetl_spark.operators.ranks import materialize_with_bounds

    base = (
        spark.range(1000)
        .select(
            F.concat(
                F.lit("https://example.com/"),
                F.md5(F.col("id").cast("string")),
            ).alias("k"),
            F.lit(1).cast("long").alias("cnt"),
        )
        .groupBy("k")
        .agg(F.sum("cnt").alias("cnt"))
    )
    g2, bounds = materialize_with_bounds(base, "k", num_buckets=32)
    assert bounds.prefix  # strip engaged
    extra = spark.createDataFrame(
        [("aaa", 3), ("zzzz", 2), (None, 1)], "k string, cnt long"
    )
    sup = g2.select("k", "cnt").unionByName(extra)
    got = _window_ref(
        bucketed_cum_sum(sup, "k", "cnt", bounds=bounds), "k", "cnt"
    )
    _assert_equal(got, ["k"])


def test_plain_list_bounds_mean_no_strip(spark):
    """Precomputed plain-list bounds (every existing caller) must keep
    the absolute image — a KeyBounds prefix only applies when the
    bounds object carries it, so bounds and assignment can never
    disagree on the image."""
    from pyspark.sql.types import StringType

    from fastetl_spark.operators.ranks import KeyBounds, _as_double

    img_abs = _as_double(F.col("k"), StringType())
    img_plain = _as_double(F.col("k"), StringType(), b"")
    df = spark.createDataFrame([("abc",), ("abd",)], "k string")
    a = df.select(img_abs.alias("i")).collect()
    b = df.select(img_plain.alias("i")).collect()
    assert a == b
    kb = KeyBounds([1.0, 2.0])
    assert kb.prefix == b"" and list(kb) == [1.0, 2.0]


def test_nonstrict_fallback_matches_window(spark):
    """strict=False makes the primitive TOTAL: past max_offset_rows the
    offsets come from a distributed prefix window joined back (no
    driver collect) and must stay bit-equal to the window form --
    including NULL group labels (the join is eqNullSafe on both
    paths).  strict=True keeps the loud RuntimeError."""
    import pytest as _pytest

    rows = [
        (grp, float(k), (k + 1) * (i + 1))
        for i, grp in enumerate(["a", "b", None, "c"])
        for k in range(5)
    ]
    g = spark.createDataFrame(rows, "grp string, k double, cnt long")
    bounds = range_bounds(g, "k", num_buckets=4)
    with _pytest.raises(RuntimeError, match="max_offset_rows"):
        bucketed_cum_sum(
            g, "k", "cnt", bounds=bounds, partition_cols=["grp"],
            max_offset_rows=3,
        ).collect()
    got = _window_ref(
        bucketed_cum_sum(
            g, "k", "cnt", bounds=bounds, partition_cols=["grp"],
            max_offset_rows=3, strict=False,
        ),
        "k", "cnt", parts=["grp"],
    )
    _assert_equal(got, ["grp", "k"])
    # under the cap, strict=False must take the broadcast path and
    # produce identical numbers
    got2 = _window_ref(
        bucketed_cum_sum(
            g, "k", "cnt", bounds=bounds, partition_cols=["grp"],
            strict=False,
        ),
        "k", "cnt", parts=["grp"],
    )
    _assert_equal(got2, ["grp", "k"])


def test_nonstrict_fallback_past_contract_cap(spark):
    """The fallback at the REAL boundary: > 2^20 distinct groups
    (ranks.MAX_OFFSET_ROWS) -- the cardinality the strict contract
    rejects -- runs distributed and matches the window form.  Two keys
    per group so the within-group prefix is non-trivial."""
    from fastetl_spark.operators.ranks import MAX_OFFSET_ROWS

    n_groups = MAX_OFFSET_ROWS + 1024
    g = (
        spark.range(2 * n_groups)
        .select(
            (F.col("id") / 2).cast("long").alias("grp"),
            (F.col("id") % 2).cast("double").alias("k"),
            ((F.col("id") % 5) + 1).cast("long").alias("cnt"),
        )
    )
    got = bucketed_cum_sum(
        g, "k", "cnt", bounds=[], partition_cols=["grp"], strict=False
    )
    # per group: exclusive prefix of k=1 row == cnt of its k=0 row
    bad = (
        got.withColumn(
            "exp",
            F.when(F.col("k") == 0.0, F.lit(0)).otherwise(
                ((F.col("grp") * 2) % 5) + 1
            ).cast("long"),
        )
        .filter(F.col("cum_below") != F.col("exp"))
        .count()
    )
    assert bad == 0


def test_grouped_row_ranks_matches_window_form(spark, sf_dir):
    """grouped_row_ranks (the r14 de-skew primitive for per-row ranks
    over dictionary-keyed groups) must be BIT-EQUAL to the window form
    it replaces: row_number() OVER (PARTITION BY g ORDER BY v, o) and
    COUNT(*) OVER (PARTITION BY g) — including NULL values (NULLS
    FIRST) and NULL group keys (one legitimate partition)."""
    from fastetl_spark.operators.ranks import grouped_row_ranks

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value", "event_id"
    )
    # inject a NULL value and a NULL group to pin the edge semantics
    extra = spark.createDataFrame(
        [(None, 1.0, -1), (None, None, -2), ("click", None, -3)],
        "event_type string, value double, event_id long",
    )
    ev = ev.unionByName(extra)
    got, sup, bounds, totals = grouped_row_ranks(
        ev, "event_type", "value", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ref = ev.select(
        "event_type",
        "value",
        "event_id",
        F.row_number().over(w).alias("r_ref"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .cast("long")
        .alias("n_ref"),
    )
    j = got.join(ref, ["event_id"], "inner")
    n = ev.count()
    assert j.count() == n
    bad = j.filter(
        (F.col("r") != F.col("r_ref")) | (F.col("n") != F.col("n_ref"))
    ).count()
    assert bad == 0
    # the returned support carries one row per (group, value) with cnt
    assert sup.agg(F.sum("cnt")).first()[0] == n
    assert sum(t for *_g, t in totals) == n
