"""LATERAL joins and the Python UDTF surface (§2.11 completion).

The reference's extension points are row-wise pandas apply and the
BaseDataCleaner plugin class (patchwork.py:264-345); SURVEY §2.11 maps
those to cleaner callables and pandas UDFs and notes no UDTF is needed
for parity. This module adds the remaining Spark-4 extension surface
anyway, because a training-data pipeline grows table-valued transforms
(one doc in, many chunks out) and correlated per-key lookups:

- ``token_windows`` — a registered Python UDTF consumed through
  ``FROM docs, LATERAL token_windows(text, N)``. The UDTF is the
  SURFACE demo: row-wise Python, so it is NOT the hot path — the
  native-expression twin (operators/text doc_chunking /
  curation.pack_context_windows) is what production runs; the gated
  query proves the UDTF's lateral expansion matches a pure-SQL
  re-derivation exactly.
- ``lateral_topk_recent_events`` — a correlated LATERAL subquery with
  ORDER BY ... LIMIT k per outer row: the "top-k per key without a
  self-join" shape. Catalyst decorrelates it; the same text runs in
  DuckDB, so the oracle is the identical query on the other engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

_WINDOW = 40

_UDTF_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(g AS INT) AS win_id,
       CAST(g * {_WINDOW} AS INT) AS start_tok,
       CAST(len(toks[g*{_WINDOW}+1 : (g+1)*{_WINDOW}]) AS INT) AS n_toks,
       array_to_string(toks[g*{_WINDOW}+1 : (g+1)*{_WINDOW}], ' ') AS chunk
FROM t, LATERAL (
  SELECT unnest(range(0, CAST(ceil(len(toks) / {_WINDOW}.0) AS BIGINT))) AS g
) w
"""


def _register_token_windows(spark: SparkSession) -> None:
    from pyspark.sql.functions import udtf

    @udtf(returnType="win_id: int, start_tok: int, n_toks: int, chunk: string")
    class TokenWindows:
        def eval(self, text: str, window: int):
            toks = (text or "").split(" ")
            for w in range(0, len(toks), window):
                sl = toks[w : w + window]
                yield (w // window, w, len(sl), " ".join(sl))

    spark.udtf.register("token_windows", TokenWindows)


@query("udtf_token_windows", _UDTF_SQL)
def udtf_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF under the gate: every document laterally expands to
    its fixed-size token windows; the DuckDB oracle re-derives the
    windows from list slices. See module docstring: surface demo with
    an exact oracle, not the hot chunking path."""
    _register_token_windows(spark)
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    d.createOrReplaceTempView("udtf_docs_v")
    return spark.sql(
        f"SELECT doc_id, w.* FROM udtf_docs_v, LATERAL token_windows(text, {_WINDOW}) AS w"
    )


_LATERAL_TOPK_SQL = """
SELECT u.user_id, l.ts, l.event_id, l.event_type
FROM (SELECT DISTINCT user_id FROM events) u,
LATERAL (
  SELECT ts, event_id, event_type FROM events e
  WHERE e.user_id = u.user_id
  ORDER BY ts DESC, event_id DESC LIMIT 2
) l
"""


@query("lateral_topk_recent_events", _LATERAL_TOPK_SQL)
def lateral_topk_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-key ORDER BY + LIMIT — the
    top-k-per-key shape written as the SQL a user would reach for;
    Catalyst decorrelates it into the same window-rank plan
    topn_orders_per_customer builds explicitly. The oracle is the
    IDENTICAL query text on DuckDB."""
    e = ensure_parallelism(read_table(spark, sf_dir, "events"))
    e.createOrReplaceTempView("events")
    return spark.sql(_LATERAL_TOPK_SQL)


# --- SQL-defined scalar functions (Spark 4 declarative cleaner plugins) ---

_SQL_UDF_SQL = """
SELECT o_orderkey,
       CAST(replace(replace(
         CAST(o_orderkey // 100 AS VARCHAR) || ',' ||
         lpad(CAST(o_orderkey % 100 AS VARCHAR), 2, '0'),
         '.', ''), ',', '.') AS DOUBLE) AS fixed_value,
       o_orderstatus IN ('O', 'F', 'P') AS status_valid
FROM orders
"""


@query("sql_udf_cleaners", _SQL_UDF_SQL)
def sql_udf_cleaners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cleaner-plugin surface as Spark 4 SQL-DEFINED FUNCTIONS
    (CREATE FUNCTION ... RETURNS ... RETURN expr): fix_decimal_comma
    and a domain validator registered declaratively — catalog-shareable
    with pure-SQL users, and Catalyst inlines the body (no UDF
    boundary, full codegen/pushdown), unlike the reference's Python
    cleaner plugins (fastETL custom_functions.py). The dirty fixture is
    derived from o_orderkey integer arithmetic so both engines parse
    the identical decimal string; the oracle inlines the same
    expression chain."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION fix_decimal_comma(s STRING) "
        "RETURNS DOUBLE "
        "RETURN CAST(replace(replace(s, '.', ''), ',', '.') AS DOUBLE)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION status_known(s STRING) "
        "RETURNS BOOLEAN RETURN s IN ('O', 'F', 'P')"
    )
    o = ensure_parallelism(read_table(spark, sf_dir, "orders"))
    o.createOrReplaceTempView("__sqludf_orders")
    return spark.sql(
        """
SELECT o_orderkey,
       fix_decimal_comma(
         CAST(o_orderkey div 100 AS STRING) || ',' ||
         lpad(CAST(o_orderkey % 100 AS STRING), 2, '0')) AS fixed_value,
       status_known(o_orderstatus) AS status_valid
FROM __sqludf_orders
"""
    )


# --- SQL pipe syntax (Spark 4) --------------------------------------------

_PIPE_SQL = """
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
         AS sum_qty,
       CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_discounted
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag
"""


@query("pipe_syntax_pricing", _PIPE_SQL)
def pipe_syntax_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's SQL pipe syntax under the gate: the same
    filter -> extend -> aggregate flow q1 expresses relationally,
    written as a |> pipeline — proving the pipe parser lowers to the
    identical semantics (exact-decimal sum, ANSI timestamp compare).
    The DuckDB oracle is the plain-SQL equivalent."""
    l = ensure_parallelism(read_table(spark, sf_dir, "lineitem"))
    l.createOrReplaceTempView("__pipe_lineitem")
    return spark.sql(
        """
FROM __pipe_lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> EXTEND CAST(l_quantity AS DECIMAL(18,6)) AS qty_dec,
          CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END AS is_discounted
|> AGGREGATE COUNT(*) AS n_items,
             CAST(ROUND(SUM(qty_dec), 2) AS DOUBLE) AS sum_qty,
             CAST(SUM(is_discounted) AS BIGINT) AS n_discounted
   GROUP BY l_returnflag
|> SELECT l_returnflag, n_items, sum_qty, n_discounted
"""
    )
