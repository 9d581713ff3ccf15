"""Text tier 2: BPE-ish tokenization, winnowing fingerprints, embedding
near-dup pairs, SQL passthrough — rounding out the LLM-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table, register_views
from fastetl_spark.registry import query

# --- BPE-ish token counting ---------------------------------------------

_BPEISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "token_count_bpeish",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPEISH}')) AS n_subword_tokens,
           len(string_split(text, ' ')) AS n_whitespace_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_number_tokens,
           len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct_tokens
    FROM documents
    """,
)
def token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-approximation counts: alpha runs + digit runs + single
    punctuation marks (the pre-merge alphabet of a BPE tokenizer) — the
    cheap compute-budget estimator of a corpus pipeline."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_BPEISH), 0)).alias("n_subword_tokens"),
        F.size(F.split("text", " ")).alias("n_whitespace_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_number_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[^A-Za-z0-9 ]"), 0)).alias("n_punct_tokens"),
    )


# --- winnowing (rolling-hash minima) fingerprints -----------------------

_WINNOW_K = 4  # k-gram size (words)
_WINNOW_W = 5  # window of consecutive k-gram hashes to take minima over

# md5 hex strings as the k-gram hash: any hash works for Schleimer
# winnowing, and md5 is bit-identical across engines — which is what
# lets this query carry a full DuckDB oracle instead of a rows-only
# check (xxhash64 exists only in Spark).
_WINNOW_SQL = f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), hashed AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(t) - {_WINNOW_K - 1}),
                        i -> md5(concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3]))) AS hs
  FROM tok WHERE len(t) >= {_WINNOW_K}
), fps AS (
  SELECT doc_id,
         list_distinct(list_transform(
             generate_series(1, greatest(len(hs) - {_WINNOW_W - 1}, 1)),
             i -> list_min(hs[i:i+{_WINNOW_W - 1}]))) AS f
  FROM hashed
)
SELECT doc_id,
       CAST(len(f) AS INTEGER) AS n_fingerprints,
       list_min(f) AS min_fp
FROM fps
"""


@query("doc_winnowing_fingerprints", _WINNOW_SQL)
def doc_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer et al.): k-gram rolling hashes, keep the
    minimum per sliding window — a compact, position-robust fingerprint
    set for plagiarism-style matching. Pure array expressions; the
    k-gram hash is md5 (engine-portable), so the result is exactly
    oracle-checkable."""
    from fastetl_spark.operators.dedup import word_tokens

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", word_tokens(F.col("text")).alias("tokens"))
    # ordered (non-distinct) k-gram hashes
    gen = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(F.col("tokens")) - (_WINNOW_K - 1), F.lit(0))),
        lambda i: F.md5(
            F.concat_ws(
                " ", *[F.element_at(F.col("tokens"), i + k) for k in range(_WINNOW_K)]
            )
        ),
    )
    hashed = tok.filter(F.size("tokens") >= _WINNOW_K).select(
        "doc_id", gen.alias("hs")
    ).transform(materialize)
    windows_min = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(F.col("hs")) - (_WINNOW_W - 1), F.lit(1))),
            lambda i: F.array_min(F.slice(F.col("hs"), i, _WINNOW_W)),
        )
    )
    fps = hashed.select("doc_id", windows_min.alias("fingerprints"))
    return fps.select(
        "doc_id",
        F.size("fingerprints").alias("n_fingerprints"),
        F.array_min("fingerprints").alias("min_fp"),
    )


# --- embedding cosine near-dup pairs ------------------------------------

_NEARDUP_COS = 0.95


@query(
    "embedding_neardup_pairs",
    f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
          >= {_NEARDUP_COS}
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, EXACT, with Cauchy-Schwarz
    pruning: per vector precompute the head-16 prefix and the tail norm;
    for a pair, sim <= (dot(head_a, head_b) + ||tail_a||*||tail_b||) /
    (||a||*||b||), so pairs whose cheap upper bound misses the threshold
    (minus a 1e-9 float-safety margin) skip the full 64-dim dot. No
    false negatives -> result identical to brute force (and the oracle).
    ~4M candidate pairs collapse to a few hundred full evaluations."""
    from fastetl_spark.operators.similarity import as_double, dot, l2_norm

    head = 16
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    v = (
        e.select("vec_id", as_double(F.col("embedding")).alias("e"))
        .withColumn("n", l2_norm(F.col("e")))
        .withColumn("h", F.slice("e", 1, head))
        .withColumn("rn", l2_norm(F.slice("e", head + 1, 10_000)))
        .transform(materialize)
    )
    a = v.select(*[F.col(c).alias(f"{c}_a") for c in v.columns])
    b = v.select(*[F.col(c).alias(f"{c}_b") for c in v.columns])
    pairs = a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    upper = (dot(F.col("h_a"), F.col("h_b")) + F.col("rn_a") * F.col("rn_b")) / (
        F.col("n_a") * F.col("n_b")
    )
    survivors = pairs.filter(upper >= _NEARDUP_COS - 1e-9)
    sim = dot(F.col("e_a"), F.col("e_b")) / (F.col("n_a") * F.col("n_b"))
    return (
        survivors.filter(sim >= _NEARDUP_COS)
        .select(F.col("vec_id_a").alias("id_a"), F.col("vec_id_b").alias("id_b"))
    )


# --- SQL passthrough (S2 query-as-source as a first-class surface) -------

_PASSTHROUGH_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag
"""


@query("sql_passthrough", _PASSTHROUGH_SQL)
def sql_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's query-as-source (S2, fast_etl.py:162-187): an
    arbitrary SQL string runs against registered table views — identical
    text executes on Spark SQL and on the oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_PASSTHROUGH_SQL)


# --- global vocabulary statistics ---------------------------------------

_VOCAB_SQL = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
)
SELECT token, COUNT(*) AS freq
FROM tok GROUP BY token
HAVING COUNT(*) >= 5
"""


@query("vocab_stats", _VOCAB_SQL)
def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies (freq >= 5): the fan-out/agg shape of
    vocabulary building; partial aggregation keeps the explode local."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return (
        d.select(F.explode_outer(F.split("text", " ")).alias("token"))
        .filter(F.col("token").isNotNull())
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .filter(F.col("freq") >= 5)
    )


# --- benchmark decontamination ------------------------------------------

_DECON_N = 5

_DECON_SQL = f"""
WITH bench AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents WHERE source = 'src0'
), train AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents WHERE source <> 'src0'
), bench_grams AS (
  SELECT DISTINCT unnest(CASE WHEN len(tokens) >= {_DECON_N}
    THEN list_transform(generate_series(1, len(tokens) - {_DECON_N - 1}),
         i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2], tokens[i+3], tokens[i+4]))
    ELSE [] END) AS gram
  FROM bench
), contaminated AS (
  SELECT DISTINCT t.doc_id
  FROM (SELECT doc_id, unnest(CASE WHEN len(tokens) >= {_DECON_N}
          THEN list_transform(generate_series(1, len(tokens) - {_DECON_N - 1}),
               i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2], tokens[i+3], tokens[i+4]))
          ELSE [] END) AS gram
        FROM train) t
  JOIN bench_grams b ON t.gram = b.gram
)
SELECT tr.doc_id, tr.doc_id IN (SELECT doc_id FROM contaminated) AS is_contaminated
FROM (SELECT doc_id FROM documents WHERE source <> 'src0') tr
"""


@query("decontaminate_against_benchmark", _DECON_SQL)
def decontaminate_against_benchmark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any
    {_DECON_N}-gram with the held-out set (source='src0' stands in for
    the benchmark). Bench grams are distinct + broadcast; training
    grams stream through the join — the standard eval-leakage sweep."""
    from pyspark.sql.functions import broadcast

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    tok = d.select("doc_id", "source", F.split("text", " ").alias("tokens"))
    gram = F.transform(
        F.sequence(F.lit(1), F.size(F.col("tokens")) - (_DECON_N - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(F.col("tokens"), i + k) for k in range(_DECON_N)]
        ),
    )
    grams = tok.filter(F.size("tokens") >= _DECON_N).select(
        "doc_id", "source", F.explode_outer(F.array_distinct(gram)).alias("gram")
    ).filter(F.col("gram").isNotNull())
    bench_grams = grams.filter(F.col("source") == "src0").select("gram").distinct()
    train_grams = grams.filter(F.col("source") != "src0")
    contaminated = (
        train_grams.join(broadcast(bench_grams), "gram").select("doc_id").distinct()
    )
    train_docs = d.filter(F.col("source") != "src0").select("doc_id")
    return train_docs.join(
        contaminated.withColumn("is_contaminated", F.lit(True)), "doc_id", "left"
    ).select("doc_id", F.coalesce("is_contaminated", F.lit(False)).alias("is_contaminated"))


# --- character entropy ----------------------------------------------------

_ENTROPY_SQL = """
WITH t AS (
  SELECT doc_id, string_split(text, '') AS cs FROM documents
), u AS (
  SELECT doc_id, cs, len(cs) AS n, list_sort(list_distinct(cs)) AS uniq
  FROM t
), p AS (
  SELECT doc_id,
         list_transform(uniq,
           ch -> CAST(len(list_filter(cs, c -> c = ch)) AS DOUBLE)
                 / CAST(n AS DOUBLE)) AS probs
  FROM u
)
SELECT doc_id,
       ROUND(-list_sum(list_transform(probs, pr -> pr * (ln(pr) / ln(2.0)))), 6)
         AS char_entropy_bits
FROM p
"""


@query("char_entropy", _ENTROPY_SQL)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the character distribution per doc — a cheap
    gibberish detector. Computed fully with array expressions: histogram
    via aggregate over SORTED distinct chars, so both engines fold the
    p·log p terms in the same order and the only cross-engine residue is
    the last ulp of ln() (Math.log vs libm) — absorbed by rounding to 6
    decimals, which promotes this from rows-only to an exact oracle."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    chars = F.split(F.col("text"), "")
    t = d.select("doc_id", chars.alias("cs")).withColumn("n", F.size("cs"))
    uniq = F.array_sort(F.array_distinct(F.col("cs")))
    counts = F.transform(uniq, lambda u: F.size(F.filter(F.col("cs"), lambda c: c == u)))
    probs = F.transform(counts, lambda k: k.cast("double") / F.col("n").cast("double"))
    entropy = -F.aggregate(
        probs, F.lit(0.0), lambda acc, p: acc + p * F.log(2.0, p)
    )
    return t.select("doc_id", F.round(entropy, 6).alias("char_entropy_bits"))
