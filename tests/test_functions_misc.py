"""Unit sweep over the remaining public column-function surface —
keeps every exported helper exercised so API rot fails fast.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from fastetl_spark.functions import cleaning as C
from fastetl_spark.functions.stable import davg, dsum
from fastetl_spark.operators.asof import asof_join
from fastetl_spark.operators.dedup import word_shingles, word_tokens


def test_wkt_point_variants(spark):
    df = spark.createDataFrame([(1, -47.88, -15.79), (2, None, -15.0)], "id long, lon double, lat double")
    out = df.select(
        C.wkt_point(F.col("lon"), F.col("lat")).alias("pg"),
        C.wkt_point(F.col("lon"), F.col("lat"), mssql=True).alias("ms"),
    ).collect()
    assert out[0].pg == "POINT(-47.88000 -15.79000)"
    assert out[0].ms == "geography::Point(-15.79000, -47.88000, 4326)"
    assert out[1].pg is None and out[1].ms is None


def test_parse_iso_z_and_last_day(spark):
    df = spark.createDataFrame([("2024-03-05T10:20:30.123Z",)], "s string")
    row = df.select(
        C.parse_iso_z(F.col("s")).alias("ts"),
        C.last_day_of_month(C.parse_iso_z(F.col("s"))).alias("eom"),
        C.last_day_of_last_month(C.parse_iso_z(F.col("s"))).alias("eolm"),
    ).first()
    assert row.ts == dt.datetime(2024, 3, 5, 10, 20, 30, 123000)
    assert row.eom == dt.date(2024, 3, 31)
    assert row.eolm == dt.date(2024, 2, 29)


def test_nullif_empty_and_strip_chars(spark):
    df = spark.createDataFrame([("", "a-b.c"), ("x", "1-2")], "a string, b string")
    rows = df.select(
        C.nullif_empty(F.col("a")).alias("a"),
        C.strip_chars(F.col("b"), "-.").alias("b"),
    ).collect()
    assert rows[0].a is None and rows[0].b == "abc"
    assert rows[1].a == "x" and rows[1].b == "12"


def test_dsum_davg_stable(spark):
    df = spark.createDataFrame([(1.11,), (2.22,), (3.33,)], "v double")
    row = df.agg(dsum("v").alias("s"), davg("v").alias("a")).first()
    assert row.s == 6.66
    assert abs(row.a - 2.22) < 1e-12


def test_word_shingles_string_variant(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "text string")
    rows = df.select(
        word_shingles(word_tokens(F.col("text")), 3).alias("sh")
    ).collect()
    assert rows[0].sh == ["a b c", "b c d"]
    assert rows[1].sh == []


def test_asof_join_exclusive(spark):
    left = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1, 12, 0))], "id long, user long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(100, 10, dt.datetime(2024, 1, 1, 12, 0)), (99, 10, dt.datetime(2024, 1, 1, 11, 0))],
        "rid long, user long, ts timestamp",
    )
    inc = asof_join(left, right.withColumnRenamed("rid", "r_id"), "user", "ts", "ts", ["r_id"])
    exc = asof_join(
        left, right.withColumnRenamed("rid", "r_id"), "user", "ts", "ts", ["r_id"], inclusive=False
    )
    assert inc.first().r_id == 100  # equal-ts row visible when inclusive
    assert exc.first().r_id == 99  # strictly-before only


def test_uf_clean_and_domain(spark):
    df = spark.createDataFrame([(" df ",), ("XX",), ("sp",)], "uf string")
    rows = [r.u for r in df.select(C.uf_clean(F.col("uf")).alias("u")).collect()]
    assert rows == ["DF", None, "SP"]


def test_replace_to_html_encode():
    from fastetl_spark.functions.htmlenc import replace_to_html_encode

    assert replace_to_html_encode("inflação") == "infla&ccedil;&atilde;o"
    assert replace_to_html_encode("§ 2º") == "&sect; 2&ordm;"
    assert replace_to_html_encode("plain ascii & <b>") == "plain ascii & <b>"
    # idempotent on already-encoded output (no '&' in the table)
    once = replace_to_html_encode("ção")
    assert replace_to_html_encode(once) == once
