"""Fourth tier: array aggregation, regex extraction, math/bitwise
clusters, deterministic hash sampling, and SCD2 history building —
utility operators an ETL user reaches for daily.

Determinism notes: collect_list is order-nondeterministic, so it is
always wrapped in array_sort before leaving an operator; math sticks to
IEEE-exact functions (sqrt, abs, floor, ceil) — log/exp/pow last-ulp
behavior differs across libm implementations and is kept out of
oracle-checked outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query

# --- array aggregation / manipulation -----------------------------------


@query(
    "array_agg_cluster",
    """
    SELECT user_id,
           CAST(to_json(list_sort(list(DISTINCT event_type))) AS VARCHAR) AS types_seen,
           len(list(DISTINCT event_type)) AS n_types,
           list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase
    FROM events
    GROUP BY user_id
    """,
)
def array_agg_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Array outputs are projected through to_json: list-valued cells crash
    # the driver's pandas sort_values canonicalizer (unhashable), and both
    # engines emit the same compact JSON for sorted string arrays.
    e = read_table(spark, sf_dir, "events")
    types = F.array_sort(F.collect_set("event_type"))
    return e.groupBy("user_id").agg(
        F.to_json(types).alias("types_seen"),
        F.size(F.collect_set("event_type")).alias("n_types"),
        F.array_contains(F.collect_set("event_type"), "purchase").alias("has_purchase"),
    )


@query(
    "array_manipulation",
    """
    SELECT doc_id,
           tokens[1] AS first_token,
           tokens[len(tokens)] AS last_token,
           CAST(to_json(list_sort(tokens[1:5])) AS VARCHAR) AS first5_sorted,
           array_to_string(tokens[1:3], '|') AS first3_joined
    FROM (SELECT doc_id, string_split(text, ' ') AS tokens FROM documents) t
    """,
)
def array_manipulation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("tokens"))
    return t.select(
        "doc_id",
        F.element_at("tokens", 1).alias("first_token"),
        F.element_at("tokens", -1).alias("last_token"),
        F.to_json(F.array_sort(F.slice("tokens", 1, 5))).alias("first5_sorted"),
        F.array_join(F.slice("tokens", 1, 3), "|").alias("first3_joined"),
    )


# --- regex cluster -------------------------------------------------------


@query(
    "regex_cluster",
    """
    SELECT o_orderkey,
           regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 1) AS priority_num,
           regexp_extract(o_orderpriority, '([0-9]+)-([A-Z]+)', 2) AS priority_word,
           regexp_matches(o_orderpriority, '^[12]-') AS is_urgent_class,
           regexp_replace(o_orderpriority, '[0-9]+-', '', 'g') AS word_only
    FROM orders
    """,
)
def regex_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", "([0-9]+)-([A-Z]+)", 1).alias("priority_num"),
        F.regexp_extract("o_orderpriority", "([0-9]+)-([A-Z]+)", 2).alias("priority_word"),
        F.col("o_orderpriority").rlike("^[12]-").alias("is_urgent_class"),
        F.regexp_replace("o_orderpriority", "[0-9]+-", "").alias("word_only"),
    )


# --- math / bitwise clusters --------------------------------------------


@query(
    "math_cluster",
    """
    SELECT event_id,
           abs(value - 100.0) AS abs_centered,
           CAST(ceil(value) AS BIGINT) AS value_ceil,
           CAST(floor(value) AS BIGINT) AS value_floor,
           sqrt(value) AS value_sqrt,
           CAST(sign(value - 100.0) AS INT) AS value_sign,
           CAST(event_id % 7 AS BIGINT) AS id_mod7,
           greatest(value, 50.0) AS at_least_50,
           least(value, 150.0) AS at_most_150
    FROM events
    """,
)
def math_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.abs(F.col("value") - 100.0).alias("abs_centered"),
        F.ceil("value").alias("value_ceil"),
        F.floor("value").alias("value_floor"),
        F.sqrt("value").alias("value_sqrt"),
        F.signum(F.col("value") - 100.0).cast("int").alias("value_sign"),
        (F.col("event_id") % 7).alias("id_mod7"),
        F.greatest(F.col("value"), F.lit(50.0)).alias("at_least_50"),
        F.least(F.col("value"), F.lit(150.0)).alias("at_most_150"),
    )


@query(
    "bitwise_cluster",
    """
    SELECT event_id,
           event_id & 255 AS low_byte,
           event_id | 1 AS forced_odd,
           xor(event_id, user_id) AS id_xor,
           event_id << 2 AS shifted_left,
           event_id >> 1 AS shifted_right
    FROM events
    """,
)
def bitwise_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.col("event_id").bitwiseOR(F.lit(1)).alias("forced_odd"),
        F.col("event_id").bitwiseXOR(F.col("user_id")).alias("id_xor"),
        F.shiftleft(F.col("event_id"), 2).alias("shifted_left"),
        F.shiftright(F.col("event_id"), 1).alias("shifted_right"),
    )


# --- deterministic hash sampling ----------------------------------------


@query(
    "hash_sample_10pct",
    """
    SELECT doc_id, lang FROM documents
    WHERE SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    """,
)
def hash_sample_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample: md5 of the key compared against a hex
    threshold ('1a'/'100' ≈ 0.1015) — reproducible on any engine and any
    partitioning, unlike rand()-based sampling."""
    d = read_table(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "1a"
    ).select("doc_id", "lang")


@query(
    "stratified_sample_per_lang",
    """
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) t WHERE rn <= 10
    """,
)
def stratified_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: top-10 per language ordered by
    key hash — the per-stratum downsampling step of a corpus pipeline."""
    d = read_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return d.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10).select(
        "doc_id", "lang"
    )


# --- SCD2 history build --------------------------------------------------


@query(
    "scd2_user_event_history",
    """
    WITH changes AS (
      SELECT user_id, event_type, ts,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
             event_id
      FROM events
    ), versions AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM changes
      WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) IS NULL AS is_current
    FROM versions
    """,
)
def scd2_user_event_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse consecutive identical
    states, emit (valid_from, valid_to, is_current) version rows — the
    standard dimension-history build the reference's upsert cannot
    express, one window pass here."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = e.select(
        "user_id", "event_type", "ts", "event_id", F.lag("event_type").over(w).alias("prev_type")
    )
    versions = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    wv = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return versions.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        F.lead("valid_from").over(wv).isNull().alias("is_current"),
    )


_UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, measure, CAST(val AS DOUBLE) AS val
FROM (
  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
  FROM lineitem WHERE l_orderkey < 100
) t
UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_discount, l_tax))
"""


@query("unpivot_measures", _UNPIVOT_SQL)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot of the lineitem measures (the inverse of the
    pivot cluster): Spark's native unpivot/melt — ids stay, each measure
    becomes a (name, value) row. A narrow 4x row expansion over the
    scan, no shuffle; values are passed through (bit-exact), only
    labeled."""
    l = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return l.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "val",
    )


_STATE_AT_SQL = """
WITH changes AS (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_id
  FROM events
), versions AS (
  SELECT user_id, event_type, ts AS valid_from, event_id
  FROM changes
  WHERE prev_type IS NULL OR prev_type <> event_type
), hist AS (
  SELECT user_id, event_type AS state_type, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, event_id) AS valid_to
  FROM versions
)
SELECT p.event_id, p.user_id, p.ts, h.state_type,
       h.valid_from AS state_since
FROM events p JOIN hist h
  ON h.user_id = p.user_id
 AND h.valid_from <= p.ts
 AND (h.valid_to IS NULL OR p.ts < h.valid_to)
WHERE p.event_type = 'purchase'
"""


@query("event_state_at_time", _STATE_AT_SQL)
def event_state_at_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitemporal lookup: each purchase event joined to the SCD2 state
    version that was CURRENT at its timestamp (valid_from <= ts <
    valid_to) — the "what did the dimension say when the fact happened"
    query that separates event-time-correct pipelines from
    latest-state-joins. The interval condition rides on the user_id
    equi-join, so the shuffle is the same as a plain key join; version
    intervals partition each user's timeline, so every fact matches
    exactly once (asserted by the oracle's row count)."""
    from fastetl_spark.operators.relational4 import scd2_user_event_history

    hist = scd2_user_event_history(spark, sf_dir).select(
        "user_id",
        F.col("event_type").alias("state_type"),
        "valid_from",
        "valid_to",
    )
    e = read_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    return (
        p.join(
            hist,
            (p.user_id == hist.user_id)
            & (hist.valid_from <= p.ts)
            & (hist.valid_to.isNull() | (p.ts < hist.valid_to)),
        )
        .select(
            "event_id", p.user_id, "ts", "state_type",
            F.col("valid_from").alias("state_since"),
        )
    )
