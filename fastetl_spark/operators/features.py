"""Feature-engineering / data-mixture operators (LLM-data family):

- ``doc_chunk_overlap`` — fixed-width overlapping character chunks (the
  RAG / long-context preprocessing split); pure generate+substring
  expressions, no Python.
- ``value_decile_bins`` — NTILE decile binning per event_type (feature
  discretization) with per-bin ranges.
- ``mixture_temperature_weights`` — temperature-based source sampling
  weights w ~ tokens^0.5 (the multinomial mixture-reweighting step from
  multilingual/data-mixture training recipes), exact via integer-
  quantized sqrt numerators.
- ``decayed_user_scores`` — half-life time-decayed per-user engagement
  score. Decay is 2^-floor(age_days/30): a power-of-two division of an
  integer-quantized value is EXACT in binary floating point, so the
  whole aggregation is an integer sum — hash-gateable, unlike a naive
  sum(value*exp(-l*age)) whose libm exp and fold order both vary.

Determinism: every aggregate here is an exact integer sum or a
passthrough double; shares are a single identical div shape over exact
integers (see registry module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

# --- overlapping character chunks ----------------------------------------

_CHUNK_W = 200
_CHUNK_STRIDE = 150  # 50-char overlap

_CHUNK_SQL = f"""
WITH starts AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text), 1), {_CHUNK_STRIDE})) AS start
  FROM documents
)
SELECT doc_id,
       CAST((start - 1) / {_CHUNK_STRIDE} + 1 AS INT) AS chunk_idx,
       CAST(start AS INT) AS start,
       length(substring(text, start, {_CHUNK_W})) AS chunk_len,
       md5(substring(text, start, {_CHUNK_W})) AS chunk_md5
FROM starts
"""


@query("doc_chunk_overlap", _CHUNK_SQL)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping {_CHUNK_W}-char chunks at stride {_CHUNK_STRIDE}.
    generate_series + substring stay whole-stage-codegen'd; the fan-out
    is a generator, not a join, so chunking 100 TB is an embarrassingly
    parallel map with no shuffle at all."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    starts = d.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(_CHUNK_STRIDE))
        ).alias("start"),
    )
    chunk = F.expr(f"substring(text, start, {_CHUNK_W})")
    return starts.select(
        "doc_id",
        (((F.col("start") - 1) / _CHUNK_STRIDE).cast("int") + 1).alias("chunk_idx"),
        F.col("start").cast("int").alias("start"),
        F.length(chunk).alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


# --- decile binning ------------------------------------------------------

_NBINS = 10

_BINS_SQL = f"""
WITH b AS (
  SELECT event_type, value,
         NTILE({_NBINS}) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events
)
SELECT event_type, bin, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v
FROM b GROUP BY 1, 2
"""


@query("value_decile_bins", _BINS_SQL)
def value_decile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE({_NBINS}) feature discretization per event_type with
    per-bin ranges. The (value, event_id) order is total, so both
    engines' standard NTILE row distribution is identical; bin edges
    are parquet-passthrough doubles."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(_NBINS).over(w).alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
        )
    )


# --- temperature mixture weights -----------------------------------------

_MIX_SCALE = 1_000_000

_MIX_SQL = f"""
WITH per_source AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
  FROM documents GROUP BY source
), num AS (
  SELECT source, n_docs, tokens,
         CAST(floor(sqrt(CAST(tokens AS DOUBLE)) * {_MIX_SCALE}) AS BIGINT) AS w_num
  FROM per_source
)
SELECT source, n_docs, tokens, w_num,
       CAST(w_num AS DOUBLE) / CAST(SUM(w_num) OVER () AS DOUBLE) AS share
FROM num
"""


@query("mixture_temperature_weights", _MIX_SQL)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source sampling weights at temperature 0.5 (w ~ tokens^0.5,
    normalized): sqrt is IEEE-correctly-rounded in both engines, so the
    integer-quantized numerators and their sum are exact; the share is
    one identical division shape. The unpartitioned window runs over
    one row per *source* — already aggregated, never row-scale."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("tokens"),
    )
    num = per_source.withColumn(
        "w_num",
        F.floor(F.sqrt(F.col("tokens").cast("double")) * _MIX_SCALE).cast("long"),
    )
    return num.select(
        "source",
        "n_docs",
        "tokens",
        "w_num",
        (
            F.col("w_num").cast("double")
            / F.sum("w_num").over(Window.partitionBy()).cast("double")
        ).alias("share"),
    )


# --- half-life decayed engagement scores ---------------------------------

_HALF_LIFE_DAYS = 30
_DECAY_SCALE = 1_000_000
_MAX_SHIFT = 62

_DECAY_SQL = f"""
WITH anchor AS (
  SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events
), c AS (
  SELECT user_id,
         LEAST(CAST(date_diff('day', CAST(ts AS DATE), d0) AS BIGINT)
                 // {_HALF_LIFE_DAYS}, {_MAX_SHIFT}) AS k,
         CAST(floor(value * {_DECAY_SCALE}) AS BIGINT) AS q
  FROM events, anchor
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(floor(CAST(q AS DOUBLE) / power(2.0, k)) AS BIGINT)) AS BIGINT)
         AS decayed_score
FROM c GROUP BY user_id
"""


@query("decayed_user_scores", _DECAY_SQL)
def decayed_user_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user engagement score with a {_HALF_LIFE_DAYS}-day half-life,
    anchored at the corpus max date. The decay 2^-k is applied as a
    power-of-two division of the integer-quantized value — exact in
    binary FP — then floored back to integers, so the per-user sum is
    an exact integer aggregate (order-independent), unlike exp()-decay
    folds. Anchor is a broadcast scalar subquery; one scan + one
    groupBy shuffle on user_id."""
    ev = read_table(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.to_date("ts")).alias("d0"))
    k = F.least(
        (F.datediff(F.col("d0"), F.to_date("ts")).cast("long") / _HALF_LIFE_DAYS).cast(
            "long"
        ),
        F.lit(_MAX_SHIFT).cast("long"),
    )
    q = F.floor(F.col("value") * _DECAY_SCALE).cast("long")
    c = ev.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        F.floor(q.cast("double") / F.pow(F.lit(2.0), k)).cast("long").alias("dq"),
    )
    return c.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("dq").cast("long").alias("decayed_score"),
    )
