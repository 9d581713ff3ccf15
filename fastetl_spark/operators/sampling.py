"""Reproducible sampling, splitting, and context packing — the
corpus-assembly stages of a training-data pipeline (LLM-data extension;
no counterpart in the reference, which replicates tables 1:1).

Everything here is DETERMINISTIC BY CONSTRUCTION: assignment is a pure
function of the row's key (a Knuth multiplicative hash over doc_id),
never of partitioning, sample(), or RNG state — the same doc lands in
the same split on any cluster, any run, any data layout. That property
is what makes ablations and dataset versioning reproducible at 100 TB,
and it is exactly what Spark's sample()/randomSplit() do NOT give you
across repartitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

# Knuth multiplicative constant; doc_id * A mod 2^32 scrambles ids into
# a uniform 0..99 bucket with exact integer arithmetic in both engines.
_HASH_A = 2654435761
_HASH_M = 4294967296


def scramble(key, mult: int = _HASH_A, salt: int = 0):
    """(key * mult + salt) mod 2^32 with the overflow-safe split
    multiply (see hash_bucket below for the derivation) — the single
    shared implementation behind hash_bucket's modular buckets and
    spatial._coord's top-bits coordinates."""
    k = F.pmod(F.col(key) if isinstance(key, str) else key, F.lit(_HASH_M))
    kh = (k / F.lit(65536)).cast("long")  # exact: k < 2^32 < 2^53
    kl = k % F.lit(65536)
    return F.pmod(
        F.pmod(kh * F.lit(mult), F.lit(_HASH_M)) * F.lit(65536)
        + kl * F.lit(mult)
        + F.lit(salt),
        F.lit(_HASH_M),
    )


def hash_bucket(key, buckets: int = 100, salt: int = 0):
    """Deterministic bucket 0..buckets-1 from an integer key column.

    Computes (key * A + salt) mod 2^32 WITHOUT the 64-bit product: a
    naive ``key * A`` overflows Long for keys >= ~3.5e9 (ANSI mode
    throws — any snowflake-style id would), so the multiply is split at
    16 bits and reduced mod 2^32 between steps (every intermediate
    < 2^49). Bit-identical to the naive formula wherever it doesn't
    overflow, which keeps the DuckDB oracles (running the naive formula
    in INT128) unchanged; pmod keeps negative keys in range. `salt`
    (< 2^32) decorrelates independent decisions on the same key (split
    vs upsample vs shard). NOTE: with a power-of-two bucket count the
    low bits degenerate to raw id residues (multiplicative hashes mix
    high bits) — use non-power-of-two buckets, or top bits as
    spatial._coord does."""
    return scramble(key, _HASH_A, salt) % F.lit(buckets)


_SPLIT_SQL = f"""
SELECT doc_id, lang,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, lang, (doc_id * {_HASH_A}) % {_HASH_M} % 100 AS bucket
  FROM documents
) t
"""


@query("deterministic_split", _SPLIT_SQL)
def deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment as a pure function of doc_id —
    stable under repartitioning, appends, and cluster size (unlike
    randomSplit). A narrow map over the scan: no shuffle at any scale."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    b = hash_bucket("doc_id")
    return d.select(
        "doc_id",
        "lang",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )


_STRAT_SQL = f"""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source, (doc_id * {_HASH_A}) % {_HASH_M} % 100 AS bucket
  FROM documents
) t
WHERE bucket < CASE WHEN lang = 'en' THEN 50 ELSE 25 END
"""


@query("stratified_sample", _STRAT_SQL)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum sampling rates (here: 50% en, 25% otherwise — the
    up/down-weighting step of corpus mixing) via the same deterministic
    bucket. Filter is pushed into the scan; no shuffle."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    b = hash_bucket("doc_id")
    rate = F.when(F.col("lang") == "en", 50).otherwise(25)
    return d.select("doc_id", "lang", "source").filter(b < rate)


def sample_by_rates(df: DataFrame, key: str, rate_col) -> DataFrame:
    """General form: keep rows where hash_bucket(key) < rate_col (a
    Column of 0..100 percentages, e.g. joined from a mixing-weights
    table)."""
    return df.filter(hash_bucket(key) < rate_col)


_PACK_BUDGET_CHARS = 2048  # ~512 tokens at 4 chars/token

_PACK_SQL = f"""
SELECT doc_id, lang, n_chars,
       CAST(FLOOR((cum - n_chars) * 1.0 / {_PACK_BUDGET_CHARS}) AS BIGINT) AS pack_id,
       CAST(cum - n_chars
            - FLOOR((cum - n_chars) * 1.0 / {_PACK_BUDGET_CHARS}) * {_PACK_BUDGET_CHARS}
            AS BIGINT) AS pack_offset
FROM (
  SELECT doc_id, lang, n_chars,
         SUM(n_chars) OVER (PARTITION BY lang ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING) AS cum
  FROM documents
) t
"""


@query("pack_context_windows", _PACK_SQL)
def pack_context_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sequence packing: within each language, docs in stable
    doc_id order fill fixed-size context windows by cumulative length;
    pack_id = floor(prefix_sum / budget) and pack_offset locate every
    doc inside its window. One window shuffle on the stratum key — the
    distributed analog of the example-packing pass before tokenization.
    (Greedy first-fit in a fixed global order; deterministic, unlike
    partition-local packing.)"""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = F.sum("n_chars").over(w) - F.col("n_chars")
    pack_id = F.floor(start * 1.0 / _PACK_BUDGET_CHARS).cast("long")
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        pack_id.alias("pack_id"),
        (start - pack_id * _PACK_BUDGET_CHARS).cast("long").alias("pack_offset"),
    )


# --- mixture rebalance (computed per-domain rates) -----------------------

# Target mixture weight per source, derived deterministically from the
# source id (suffix % 4 + 1 => weights 1..4). In a real pipeline this is
# a config table; deriving it keeps the oracle self-contained.
_MIX_SQL = f"""
WITH w AS (
  SELECT source, COUNT(*) AS cnt,
         (CAST(SUBSTR(source, 4) AS INT) % 4) + 1 AS weight
  FROM documents GROUP BY source
), rates AS (
  SELECT source,
         LEAST(100, CAST(FLOOR(
           100.0 * (SELECT SUM(cnt) FROM w) * weight
           / ((SELECT SUM(weight) FROM w) * cnt)) AS BIGINT)) AS keep_pct
  FROM w
)
SELECT d.doc_id, d.source, r.keep_pct
FROM documents d JOIN rates r ON r.source = d.source
WHERE (d.doc_id * {_HASH_A}) % {_HASH_M} % 100 < r.keep_pct
"""


@query("mixture_rebalance", _MIX_SQL)
def mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing: per-source keep-rates COMPUTED from the
    observed distribution so the surviving corpus approaches target
    domain weights (rate = target_count / actual_count, capped at 100%).
    The rates table is one tiny aggregate (|sources| rows) broadcast back
    onto the scan; row selection is the same deterministic id-hash bucket
    as the other samplers — reproducible on any layout, and the only
    shuffle is the |sources|-row aggregate. Upsampling (weight > supply)
    is intentionally capped, not duplicated — repetition policy belongs
    to the epoch sampler, not the filter."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    w = (
        d.groupBy("source")
        .agg(F.count("*").alias("cnt"))
        .withColumn("weight", (F.substring("source", 4, 10).cast("int") % 4) + 1)
    )
    tot = w.agg(
        F.sum("cnt").alias("total"), F.sum("weight").alias("sum_w")
    )
    rates = (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.least(
                F.lit(100),
                F.floor(
                    F.lit(100.0) * F.col("total") * F.col("weight")
                    / (F.col("sum_w") * F.col("cnt"))
                ).cast("long"),
            ).alias("keep_pct"),
        )
    )
    return (
        d.join(F.broadcast(rates), "source")
        .select("doc_id", "source", "keep_pct")
        .filter(hash_bucket("doc_id") < F.col("keep_pct"))
    )


# --- epoch upsampling (fractional repetition) ----------------------------

# Per-source epoch weight in HALVES (weight/2 epochs): suffix % 4 + 1
# halves => 0.5x..2x. Integer halves keep every decision exact.
_EPOCH_SALT = 1_013_904_223  # decorrelates the fractional-copy decision

_EPOCH_SQL = f"""
WITH weighted AS (
  SELECT doc_id, source,
         (CAST(SUBSTR(source, 4) AS INT) % 4) + 1 AS halves
  FROM documents
), expanded AS (
  SELECT doc_id, source, halves,
         halves // 2 AS full_copies,
         (halves % 2) * 50 AS frac_pct
  FROM weighted
)
SELECT doc_id, source, copy_idx
FROM expanded,
     LATERAL unnest(generate_series(1, full_copies
       + CASE WHEN (doc_id * {_HASH_A} + {_EPOCH_SALT}) % {_HASH_M} % 100
                   < frac_pct
              THEN 1 ELSE 0 END)) AS t(copy_idx)
"""


@query("epoch_upsample", _EPOCH_SQL)
def epoch_upsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-aware upsampling: each source gets a fractional epoch
    weight (here 0.5x-2x in halves); documents are REPEATED floor(w)
    times and the fractional remainder is a salted deterministic hash
    draw — how a mixing pipeline realizes "2.5 epochs of source X"
    reproducibly. The dual of mixture_rebalance (which only downsamples).
    Expansion is explode(sequence(...)) — a narrow generate, no shuffle,
    and copy_idx survives so downstream shuffles can spread replicas."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    w = d.select(
        "doc_id", "source",
        ((F.substring("source", 4, 10).cast("int") % 4) + 1).alias("halves"),
    )
    frac_hit = (
        hash_bucket("doc_id", salt=_EPOCH_SALT) < (F.col("halves") % 2) * 50
    ).cast("long")
    n_copies = F.floor(F.col("halves") / 2).cast("long") + frac_hit
    # sequence(1, 0) generates DESCENDING [1, 0] in Spark — guard the
    # zero-copy case to an empty array instead
    copies = F.when(n_copies >= 1, F.sequence(F.lit(1).cast("long"), n_copies)).otherwise(
        F.expr("CAST(array() AS ARRAY<BIGINT>)")
    )
    return (
        w.select("doc_id", "source", F.explode_outer(copies).alias("copy_idx"))
        .filter(F.col("copy_idx").isNotNull())
    )


# --- deterministic weighted sampling (priority sampling) ------------------

_PRIORITY_K = 50

_PRIORITY_SQL = f"""
WITH prio AS (
  SELECT doc_id, lang, n_chars,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS priority
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars
FROM prio
ORDER BY priority, doc_id
LIMIT {_PRIORITY_K}
"""


@query("priority_sample_weighted", _PRIORITY_SQL)
def priority_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (priority
    sampling, Duffield et al.): each document draws a reproducible
    uniform u from the md5 of its key, gets priority u / weight
    (weight = n_chars, so longer documents are proportionally likelier),
    and the k smallest priorities are the sample. Engine-portable by
    construction: u is integer hash arithmetic and the priority is ONE
    IEEE division (exactly rounded everywhere) — the textbook u^(1/w)
    exponentiation would diverge across libm implementations in the
    last ulp and flip near-ties. Top-k compiles to
    TakeOrderedAndProject, so the corpus is never globally sorted."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10).cast(
        "double"
    )
    prio = d.select(
        "doc_id", "lang", "n_chars", (u / F.col("n_chars").cast("double")).alias("priority")
    )
    return (
        prio.orderBy("priority", "doc_id")
        .limit(_PRIORITY_K)
        .select("doc_id", "lang", "n_chars")
    )


# --- weighted sampling without replacement (Efraimidis-Spirakis) ---------

_WS_K = 5  # sample size per source


def weighted_sample_wor(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    weight_col: str,
    k: int = _WS_K,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement per stratum
    (Efraimidis-Spirakis 2006): each row draws an exponential key
    e = -ln(u)/w from a reproducible md5-derived uniform u, and the k
    smallest keys per stratum are the sample — inclusion probability
    proportional to weight, one window pass, no iteration. The id-hash
    uniform makes the sample layout- and rerun-stable (the same
    property hash_sample/deterministic_split rely on).

    Exactness note: u is a single cast+divide of a 60-bit integer
    (bit-identical across engines); ln()'s last ulp is the only
    residue, and rank flips would need two continuous keys within
    ~1e-15 relative — the sin-LSH/argmax promotion argument.
    """
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(1)).cast("double") / F.lit(float(2**60))
    key = -F.log(u) / F.col("weight").cast("double")
    w = Window.partitionBy(strata_col).orderBy(F.asc("es_key"), F.asc(id_col))
    return (
        df.select(strata_col, id_col, F.col(weight_col).alias("weight"))
        .withColumn("es_key", key)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(strata_col, id_col, "weight", "rank")
    )


_WS_SQL = f"""
WITH keyed AS (
  SELECT source, doc_id, CAST(n_chars AS DOUBLE) AS weight,
         -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT + 1)
             / 1152921504606846976.0)
           / CAST(n_chars AS DOUBLE) AS es_key
  FROM documents
), ranked AS (
  SELECT source, doc_id, weight,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY es_key, doc_id) AS rank
  FROM keyed
)
SELECT source, doc_id, weight, rank FROM ranked WHERE rank <= {_WS_K}
"""


@query("weighted_sample_per_source", _WS_SQL)
def weighted_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample ({_WS_K} per source) via
    Efraimidis-Spirakis exponential keys — longer docs proportionally
    likelier, deterministic across reruns and partitionings."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return weighted_sample_wor(
        d.withColumn("n_chars", F.col("n_chars").cast("double")),
        "source",
        "doc_id",
        "n_chars",
    )


# --- cross-split leakage audit -------------------------------------------


def _leakage_sql() -> str:
    from fastetl_spark.operators.dedup import _JACCARD_SQL

    # reuse the gated Jaccard pair SQL verbatim as a subquery, then tag
    # both sides with the deterministic split and keep boundary-crossers
    return f"""
WITH pairs AS ({_JACCARD_SQL}),
splits AS (
  SELECT doc_id,
         CASE WHEN bucket < 80 THEN 'train'
              WHEN bucket < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (
    SELECT doc_id, (doc_id * {_HASH_A}) % {_HASH_M} % 100 AS bucket
    FROM documents
  ) t
)
SELECT p.doc_a, p.doc_b, p.jaccard, sa.split AS split_a, sb.split AS split_b
FROM pairs p
JOIN splits sa ON sa.doc_id = p.doc_a
JOIN splits sb ON sb.doc_id = p.doc_b
WHERE sa.split <> sb.split
"""


@query("split_leakage_report", _leakage_sql())
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: near-duplicate pairs (df-capped
    shingle Jaccard, dedup.ngram_jaccard_pairs) whose two documents
    land in DIFFERENT deterministic splits — each row is an eval
    example leaked into training (or vice versa). The fix loop: feed
    these pairs to connected_components and move whole clusters to one
    split. Composes two gated operators, so the leakage report itself
    is hash-proven.

    Scale shape: the pair table is the output of candidate generation
    (orders of magnitude smaller than the corpus); split tagging is a
    pure doc_id function (broadcast-free narrow map on each side)."""
    from fastetl_spark.operators.dedup import ngram_jaccard_pairs

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    pairs = ngram_jaccard_pairs(d)
    b = hash_bucket("doc_id")
    splits = d.select(
        "doc_id",
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split"),
    )
    sa = splits.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "jaccard", "split_a", "split_b")
    )


# --- class-balanced exact-quota downsampling -----------------------------

# Balanced corpus across classes by COUNT (not rate): every language
# keeps exactly quota = min(per-lang count) docs, chosen by a
# deterministic md5 ranking — the "undersample the majority classes to
# the minority size" step classifier training data and multilingual
# corpus balancing both need. Differs from stratified_sample (fixed
# RATE per stratum: relative sizes preserved) — here the OUTPUT sizes
# are equalized.
_CBD_SQL = """
WITH quota AS (
  SELECT MIN(n) AS q FROM (
    SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang) t
), ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                    doc_id) AS rnk
  FROM documents
)
SELECT doc_id, lang, CAST(rnk AS BIGINT) AS rnk
FROM ranked CROSS JOIN quota
WHERE rnk <= q
"""


@query("class_balanced_downsample", _CBD_SQL)
def class_balanced_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota class balancing: every lang keeps min-class-size
    docs, selected by portable md5 rank (deterministic, shuffle-free
    choice of WHICH docs survive — re-runs pick the same set).

    Scale shape: one count aggregate for the quota (broadcast scalar) +
    one per-class window rank. The rank window partitions by class —
    fine while each class fits a partition's sort (the window sorts
    within class); at extreme class sizes swap the rank for the
    hash-threshold form (keep hash < quota/count scaled), which is
    pure per-row arithmetic at a small quota-accuracy cost."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    counts = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    quota = counts.agg(F.min("n").alias("q"))
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    )
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    ranked = d.select(
        "doc_id", "lang", F.row_number().over(w).cast("long").alias("rnk")
    )
    return ranked.crossJoin(F.broadcast(quota)).filter(
        F.col("rnk") <= F.col("q")
    ).select("doc_id", "lang", "rnk")
