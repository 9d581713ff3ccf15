"""Registered queries exercising the cleaners (F1–F11, J1, QA log) on
the driver tables. Dirt is synthesized *deterministically in-query* from
the clean fixtures (the driver tables are read-only), then cleaned by
the real engine expressions; the DuckDB oracle synthesizes and cleans
identically, so the whole clean path is hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fastetl_spark.functions import cleaning as C
from fastetl_spark.functions.cpf import (
    cpf_check_digit_1,
    cpf_check_digit_2,
    cpf_clean,
    cpf_is_valid,
)
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

# --- F1: decimal-comma repair -------------------------------------------

_F1_SQL = """
WITH dirty AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_orderkey % 19 = 0 THEN 'N/A'
              ELSE CONCAT(CAST(cents // 100 AS VARCHAR), ',',
                          LPAD(CAST(cents % 100 AS VARCHAR), 2, '0'))
         END AS price_str
  FROM (SELECT l_orderkey, l_linenumber,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem) c
)
SELECT l_orderkey, l_linenumber, price_str,
       TRY_CAST(REPLACE(price_str, ',', '.') AS DOUBLE) AS price_clean
FROM dirty
"""


@query("clean_decimal_comma", _F1_SQL)
def clean_decimal_comma(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = ensure_parallelism(read_table(spark, sf_dir, "lineitem"))
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    int_part = F.floor(cents / 100).cast("bigint").cast("string")
    frac_part = F.lpad((cents % 100).cast("string"), 2, "0")
    dirty = F.when(F.col("l_orderkey") % 19 == 0, F.lit("N/A")).otherwise(
        F.concat(int_part, F.lit(","), frac_part)
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        dirty.alias("price_str"),
    ).withColumn("price_clean", C.fix_decimal_comma(F.col("price_str")))


# --- F2+F3: coordinate scale repair + bounds nulling ---------------------

_COORD_SQL = """
WITH dirty AS (
  SELECT event_id,
         CASE WHEN event_id % 7 = 0 THEN (value - 100.0) * 100000.0
              ELSE value - 100.0 END AS lat,
         value * 3.6 - 180.0 AS lon
  FROM events
)
SELECT event_id,
  CASE WHEN fixed_lat BETWEEN -90.0 AND 90.0 THEN fixed_lat END AS lat_clean,
  CASE WHEN lon BETWEEN -180.0 AND 180.0 THEN lon END AS lon_clean
FROM (
  SELECT event_id, lon,
         CASE WHEN NOT (lat BETWEEN -90.0 AND 90.0)
                   AND abs(lat) > 900.0
                   AND (lat / 100000.0) BETWEEN -90.0 AND 90.0
              THEN lat / 100000.0 ELSE lat END AS fixed_lat
  FROM dirty
)
"""


@query("clean_coordinates", _COORD_SQL)
def clean_coordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    lat = F.when(F.col("event_id") % 7 == 0, (F.col("value") - 100.0) * 100000.0).otherwise(
        F.col("value") - 100.0
    )
    lon = F.col("value") * 3.6 - 180.0
    dirty = e.select("event_id", lat.alias("lat"), lon.alias("lon"))
    fixed = dirty.withColumn("lat", C.fix_coordinate_scale(F.col("lat"), -90.0, 90.0))
    return fixed.select(
        "event_id",
        C.null_out_of_bounds(F.col("lat"), -90.0, 90.0).alias("lat_clean"),
        C.null_out_of_bounds(F.col("lon"), -180.0, 180.0).alias("lon_clean"),
    )


# --- F4: WKT point construction -----------------------------------------

_WKT_SQL = """
WITH coords AS (
  SELECT event_id,
         CASE WHEN value - 100.0 BETWEEN -90.0 AND 90.0 THEN value - 100.0 END AS lat,
         CASE WHEN value * 3.6 - 180.0 BETWEEN -180.0 AND 180.0 THEN value * 3.6 - 180.0 END AS lon
  FROM events
)
SELECT event_id,
       CASE WHEN lat IS NOT NULL AND lon IS NOT NULL
            THEN printf('POINT(%.5f %.5f)', lon, lat) END AS wkt
FROM coords
"""


@query("wkt_point", _WKT_SQL)
def wkt_point_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    lat = C.null_out_of_bounds(F.col("value") - 100.0, -90.0, 90.0)
    lon = C.null_out_of_bounds(F.col("value") * 3.6 - 180.0, -180.0, 180.0)
    coords = e.select("event_id", lat.alias("lat"), lon.alias("lon"))
    return coords.select(
        "event_id", C.wkt_point(F.col("lon"), F.col("lat")).alias("wkt")
    )


# --- F5: CPF validation --------------------------------------------------

_CPF_DIGIT = "CAST(SUBSTR({s}, {i}, 1) AS INT)"


def _cpf_sum_sql(s: str, weight_base: int) -> str:
    terms = " + ".join(f"{_CPF_DIGIT.format(s=s, i=i)} * {weight_base - i}" for i in range(1, 10))
    return f"({terms})"


_CPF_SQL = f"""
WITH base AS (
  SELECT c_custkey, LPAD(CAST(c_custkey % 999999999 AS VARCHAR), 9, '0') AS b9
  FROM customer
), dv AS (
  SELECT c_custkey, b9,
         ({_cpf_sum_sql('b9', 11)} * 10) % 11 % 10 AS dv1
  FROM base
), cpfs AS (
  SELECT c_custkey, b9, dv1,
         (({_cpf_sum_sql('b9', 12)} + dv1 * 2) * 10) % 11 % 10 AS dv2
  FROM dv
), dirty AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 5 = 0
              THEN CONCAT(b9, CAST(dv1 AS VARCHAR), CAST((dv2 + 1) % 10 AS VARCHAR))
              ELSE CONCAT(SUBSTR(b9, 1, 3), '.', SUBSTR(b9, 4, 3), '.', SUBSTR(b9, 7, 3),
                          '-', CAST(dv1 AS VARCHAR), CAST(dv2 AS VARCHAR))
         END AS cpf_input
  FROM cpfs
), norm AS (
  SELECT c_custkey, cpf_input,
         LPAD(REPLACE(REPLACE(cpf_input, '.', ''), '-', ''), 11, '0') AS n
  FROM dirty
)
SELECT c_custkey, cpf_input,
  (regexp_full_match(n, '[0-9]{{11}}')
   AND n <> repeat(SUBSTR(n, 1, 1), 11)
   AND {_CPF_DIGIT.format(s='n', i=10)} = ({_cpf_sum_sql('n', 11)} * 10) % 11 % 10
   AND {_CPF_DIGIT.format(s='n', i=11)} =
       (({_cpf_sum_sql('n', 12)} + (({_cpf_sum_sql('n', 11)} * 10) % 11 % 10) * 2) * 10) % 11 % 10
  ) AS cpf_valid,
  CASE WHEN (regexp_full_match(n, '[0-9]{{11}}')
   AND n <> repeat(SUBSTR(n, 1, 1), 11)
   AND {_CPF_DIGIT.format(s='n', i=10)} = ({_cpf_sum_sql('n', 11)} * 10) % 11 % 10
   AND {_CPF_DIGIT.format(s='n', i=11)} =
       (({_cpf_sum_sql('n', 12)} + (({_cpf_sum_sql('n', 11)} * 10) % 11 % 10) * 2) * 10) % 11 % 10)
  THEN n END AS cpf_clean
FROM norm
"""


@query("clean_cpf", _CPF_SQL)
def clean_cpf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize CPFs from c_custkey (valid check digits via the real
    algorithm), corrupt every 5th, then run the engine's validator."""
    c = ensure_parallelism(read_table(spark, sf_dir, "customer"))
    b9 = F.lpad((F.col("c_custkey") % 999999999).cast("string"), 9, "0")
    base = c.select("c_custkey", b9.alias("b9"))
    dv1 = cpf_check_digit_1(F.col("b9"))
    with_dv = base.withColumn("dv1", dv1).withColumn(
        "dv2", cpf_check_digit_2(F.col("b9"), F.col("dv1"))
    )
    dirty = with_dv.select(
        "c_custkey",
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.concat(
                F.col("b9"),
                F.col("dv1").cast("string"),
                ((F.col("dv2") + 1) % 10).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.substring("b9", 1, 3), F.lit("."),
                F.substring("b9", 4, 3), F.lit("."),
                F.substring("b9", 7, 3), F.lit("-"),
                F.col("dv1").cast("string"), F.col("dv2").cast("string"),
            )
        )
        .alias("cpf_input"),
    )
    return dirty.select(
        "c_custkey",
        "cpf_input",
        cpf_is_valid(F.col("cpf_input")).alias("cpf_valid"),
        cpf_clean(F.col("cpf_input")).alias("cpf_clean"),
    )


# --- F6: domain check ----------------------------------------------------

_DOMAIN_SQL = """
SELECT event_id,
       CASE WHEN event_type IN ('click', 'view', 'purchase', 'signup')
            THEN event_type END AS event_type_clean
FROM events
"""


@query("clean_domain", _DOMAIN_SQL)
def clean_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        C.domain_check(F.col("event_type"), ["click", "view", "purchase", "signup"]).alias(
            "event_type_clean"
        ),
    )


# --- F7: text crop -------------------------------------------------------

_CROP_SQL = """
SELECT doc_id,
       CASE WHEN LENGTH(text) > 120 THEN CONCAT(SUBSTR(text, 1, 117), '...')
            ELSE text END AS text_cropped,
       LENGTH(text) > 120 AS was_cropped
FROM documents
"""


@query("clean_text_crop", _CROP_SQL)
def clean_text_crop(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        C.text_crop(F.col("text"), 120).alias("text_cropped"),
        (F.length("text") > 120).alias("was_cropped"),
    )


# --- F10: ISO timestamp round-trip --------------------------------------

_ISO_SQL = """
SELECT event_id,
       strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS ts_parsed
FROM events
"""


@query("iso_timestamp_roundtrip", _ISO_SQL)
def iso_timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    return e.select(
        "event_id", F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss").alias("ts_parsed")
    )


# --- F11: last day of month ---------------------------------------------

_LASTDAY_SQL = """
SELECT CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


@query("last_day_of_month", _LASTDAY_SQL)
def last_day_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # month_end is projected as TIMESTAMP on both sides: a bare DATE column
    # round-trips to pandas as `object` datetime.date cells on the Spark
    # side but datetime64 on the DuckDB side, which hash-mismatches in the
    # driver's pandas canonicalizer.
    o = read_table(spark, sf_dir, "orders")
    return (
        o.select(
            C.last_day_of_month(F.col("o_orderdate").cast("date"))
            .cast("timestamp")
            .alias("month_end")
        )
        .groupBy("month_end")
        .agg(F.count("*").alias("n_orders"))
    )


# --- J1: canonical-value mapping join (broadcast) ------------------------

_CANON_SQL = """
WITH map AS (
  SELECT * FROM (VALUES
    ('click',    'Clique'),
    ('view',     'Visualização'),
    ('purchase', 'Compra')
  ) AS t(dirty_value, valor_canonico)
)
SELECT event_id, event_type,
       COALESCE(valor_canonico, event_type) AS event_type_canonical
FROM events LEFT JOIN map ON event_type = dirty_value
"""


@query("canonical_mapping_join", _CANON_SQL)
def canonical_mapping_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GSheetMappingCleaner (patchwork.py:865-897): left-join a tiny
    canonical map and coalesce — the map is broadcast, zero shuffle of
    the fact side."""
    e = read_table(spark, sf_dir, "events")
    mapping = spark.createDataFrame(
        [("click", "Clique"), ("view", "Visualização"), ("purchase", "Compra")],
        "dirty_value string, valor_canonico string",
    )
    return (
        e.join(broadcast(mapping), e.event_type == mapping.dirty_value, "left")
        .select(
            "event_id",
            "event_type",
            F.coalesce("valor_canonico", "event_type").alias("event_type_canonical"),
        )
    )


# --- QA log pipeline (§2.8) ---------------------------------------------

_QA_SQL = """
SELECT 'event_id' AS primary_keys_labels,
       CAST(event_id AS VARCHAR) AS primary_keys_values,
       'event_type' AS coluna,
       event_type AS valor_original,
       CAST(NULL AS VARCHAR) AS valor_considerado,
       2 AS nivel_erro
FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
UNION ALL
SELECT 'event_id', CAST(event_id AS VARCHAR), 'value',
       printf('%.2f', value), printf('%.2f', 190.0), 1
FROM events WHERE value > 190.0
"""


@query("qa_log_pipeline", _QA_SQL)
def qa_log_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two cleaners' QA output (CAST_NULL domain violations + CAST_FIX
    value clamps), projected on the hash-stable QA columns (motivo text
    and timestamps excluded per SURVEY §7.3.1)."""
    from fastetl_spark.plans.qa import QALogLevel, qa_rows

    e = read_table(spark, sf_dir, "events")
    domain_qa = qa_rows(
        e,
        pks=["event_id"],
        esquema="public",
        tabela="events",
        coluna="event_type",
        violation=~F.col("event_type").isin("click", "view", "purchase", "signup"),
        original=F.col("event_type"),
        considered=F.lit(None).cast("string"),
        level=QALogLevel.CAST_NULL,
        motivo="valor fora do domínio",
    )
    clamp_qa = qa_rows(
        e,
        pks=["event_id"],
        esquema="public",
        tabela="events",
        coluna="value",
        violation=F.col("value") > 190.0,
        original=F.format_string("%.2f", F.col("value")),
        considered=F.format_string("%.2f", F.lit(190.0)),
        level=QALogLevel.CAST_FIX,
        motivo="valor acima do limite",
    )
    stable = ["primary_keys_labels", "primary_keys_values", "coluna",
              "valor_original", "valor_considerado", "nivel_erro"]
    return domain_qa.select(*stable).unionByName(clamp_qa.select(*stable))
