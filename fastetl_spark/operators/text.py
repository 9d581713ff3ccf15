"""Text analysis operators over `documents` — language ID, quality
scoring, token counting, fingerprinting (LLM-data extension).

All pure column expressions (split / filter / size / md5) — no Python in
the pipeline, so these run at scan speed over 100 TB of text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "a"],
    "es": ["el", "la", "de", "que", "y", "los", "en"],
    "fr": ["le", "la", "de", "et", "les", "des", "un"],
    "de": ["der", "die", "und", "das", "ist", "von", "ein"],
}
_LANG_ORDER = ["en", "es", "fr", "de"]  # deterministic argmax tiebreak


def _stopword_hits(tokens: Column, lang: str) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(STOPWORDS[lang])))


# --- token counting ------------------------------------------------------

_TOKENS_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       LENGTH(text) AS n_chars_measured,
       LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS n_spaces
FROM documents
"""


@query("token_count", _TOKENS_SQL)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))).alias(
            "n_spaces"
        ),
    )


# --- quality scoring -----------------------------------------------------

_QUALITY_SQL = """
WITH t AS (
  SELECT doc_id, LENGTH(text) AS n_chars,
         string_split(text, ' ') AS tokens
  FROM documents
)
SELECT doc_id, n_chars,
       len(tokens) AS n_tokens,
       len(list_distinct(tokens)) AS n_unique,
       len(list_distinct(tokens)) * 1.0 / len(tokens) AS type_token_ratio,
       (n_chars - len(tokens) + 1) * 1.0 / len(tokens) AS avg_token_len,
       len(list_filter(tokens, t -> t IN ('the','and','of','to','in','is','a'))) * 1.0
         / len(tokens) AS stopword_ratio
FROM t
"""


@query("text_quality", _QUALITY_SQL)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length / diversity / stopword-ratio quality features — the usual
    first-pass filters of a pretraining corpus pipeline."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tokens = F.split(F.col("text"), " ")
    t = d.select("doc_id", F.length("text").alias("n_chars"), tokens.alias("tokens"))
    return t.select(
        "doc_id",
        "n_chars",
        F.size("tokens").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).alias("n_unique"),
        (F.size(F.array_distinct("tokens")) * 1.0 / F.size("tokens")).alias("type_token_ratio"),
        ((F.col("n_chars") - F.size("tokens") + 1) * 1.0 / F.size("tokens")).alias("avg_token_len"),
        (_stopword_hits(F.col("tokens"), "en") * 1.0 / F.size("tokens")).alias("stopword_ratio"),
    )


# --- language identification --------------------------------------------


def _lang_sql_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(tokens, t -> t IN ({words})))"


_LANG_SQL = f"""
WITH scores AS (
  SELECT doc_id, lang,
         {_lang_sql_hits('en')} AS s_en,
         {_lang_sql_hits('es')} AS s_es,
         {_lang_sql_hits('fr')} AS s_fr,
         {_lang_sql_hits('de')} AS s_de
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS tokens FROM documents) t
)
SELECT doc_id, lang,
  CASE
    WHEN s_en = 0 AND s_es = 0 AND s_fr = 0 AND s_de = 0 THEN 'und'
    WHEN s_en >= s_es AND s_en >= s_fr AND s_en >= s_de THEN 'en'
    WHEN s_es >= s_fr AND s_es >= s_de THEN 'es'
    WHEN s_fr >= s_de THEN 'fr'
    ELSE 'de'
  END AS lang_pred
FROM scores
"""


@query("lang_id", _LANG_SQL)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-lexicon language ID with a fixed tiebreak order — the
    classic cheap n-gram heuristic, vectorized."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tokens = F.split(F.col("text"), " ")
    t = d.select("doc_id", "lang", tokens.alias("tokens"))
    scores = t.select(
        "doc_id",
        "lang",
        *[_stopword_hits(F.col("tokens"), lg).alias(f"s_{lg}") for lg in _LANG_ORDER],
    )
    pred = (
        F.when(
            (F.col("s_en") == 0) & (F.col("s_es") == 0) & (F.col("s_fr") == 0) & (F.col("s_de") == 0),
            F.lit("und"),
        )
        .when(
            (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_de")),
            F.lit("en"),
        )
        .when((F.col("s_es") >= F.col("s_fr")) & (F.col("s_es") >= F.col("s_de")), F.lit("es"))
        .when(F.col("s_fr") >= F.col("s_de"), F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return scores.select("doc_id", "lang", pred.alias("lang_pred"))


# --- document fingerprinting --------------------------------------------

_FP_SQL = """
SELECT doc_id,
       md5(text) AS fp_exact,
       md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp_normalized,
       SUBSTR(md5(text), 1, 8) AS fp_short
FROM documents
"""


@query("doc_fingerprint", _FP_SQL)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fastetl_spark.operators.dedup import normalize_text

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.md5("text").alias("fp_exact"),
        F.md5(normalize_text(F.col("text"))).alias("fp_normalized"),
        F.substring(F.md5("text"), 1, 8).alias("fp_short"),
    )


# --- per-language corpus stats (groupBy surface over text features) ------

_LANG_STATS_SQL = """
SELECT lang, source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
"""


@query("corpus_stats", _LANG_STATS_SQL)
def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


# --- encoding QA: mojibake / replacement-char detection ------------------

# the classic UTF-8-read-as-Latin-1 artifacts ("Ã©" where
# e-acute was meant, "â€™" for a typographic apostrophe)
# plus the decoder replacement char U+FFFD — a crawl shard that was
# double-decoded shows up here long before a language model chokes on
# it. Built from \u escapes so the pattern is byte-identical in Spark's
# Java regex and DuckDB's RE2 (the source file stays pure ASCII).
_MOJIBAKE_PAT = (
    "(\u00C3[\u0080-\u00BF]"      # A-tilde + Latin-1 continuation byte
    # a-circumflex + euro + the third mojibake byte as either its C1
    # control (Latin-1 view) or its cp1252 glyph (what users see)
    "|\u00E2\u20AC[\u0098\u0099\u009C\u009D\u00A2\u00A6\u2122\u02DC\u0153]"
    "|\uFFFD)"                      # decoder replacement char
)
_NON_ASCII_PAT = "[^\\x00-\\x7F]"

_ENCODING_QA_SQL = f"""
SELECT doc_id,
       CAST(LENGTH(text) - LENGTH(regexp_replace(text, '{_MOJIBAKE_PAT}', '', 'g'))
            AS BIGINT) AS n_mojibake_chars,
       CAST(len(regexp_extract_all(text, '{_NON_ASCII_PAT}')) AS BIGINT)
           AS n_non_ascii,
       CAST(LENGTH(text) AS BIGINT) AS n_chars
FROM documents
"""


@query("encoding_qa", _ENCODING_QA_SQL)
def encoding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document encoding sanity: count of mojibake artifact chars
    (UTF-8 double-decode sequences, U+FFFD replacement), non-ASCII
    chars, and total length — the shard-level gate that catches a
    mis-decoded crawl source. Pure native regexes, one scan, fuses
    into codegen with any other per-doc metric."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", _MOJIBAKE_PAT, ""))
        ).cast("long").alias("n_mojibake_chars"),
        F.size(F.regexp_extract_all("text", F.lit(_NON_ASCII_PAT), 0))
        .cast("long")
        .alias("n_non_ascii"),
        F.length("text").cast("long").alias("n_chars"),
    )
