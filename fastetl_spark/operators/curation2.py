"""Similarity-space curation extensions (LLM-data family, round 5):

- ``semantic_dedup`` — SemDeDup (Abbas et al. 2023): cluster embeddings
  to coarse cells, then drop items with a sufficiently-similar
  smaller-id neighbor *within the cell*. Pair work is bounded by cell
  size, never corpus², which is the whole point at 100 TB: more cells →
  smaller cells → flat per-cell cost.
- ``sparse_cosine_shingles`` — all-pairs tf-cosine over word-shingle
  vectors via an inverted index with a document-frequency cap (the
  classic prefix-filter/DISCO trick): pair work scales with sum(df²)
  per shingle, bounded by the cap, not |docs|².
- ``knn_label_vote`` — k-nearest-neighbor majority label vote over the
  embedding corpus (the quality-classifier-by-neighbors curation step).
- ``winsorize_event_values`` — exact nearest-rank percentile clamp
  report (outlier handling before numeric feature aggregation).

Determinism: all similarity decisions are made in exact integer
arithmetic over quantized vectors/term frequencies (see the registry
module docstring); the only doubles in outputs are either parquet
passthrough values or a single identical IEEE scalar shape computed
from exact integers on both engines, so every query here sits under
the exact DuckDB hash gate.

Reference parity note: the reference (fastETL) has no
embedding/similarity surface; these extend the engine for
training-data curation as SURVEY.md §2.10-2.11 extensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.operators.dedup import word_tokens
from fastetl_spark.operators.similarity import TOP_K, QUERY_STRIDE, as_double, cosine_topk
from fastetl_spark.registry import query

# --- SemDeDup ------------------------------------------------------------

_SD_CENTROIDS = 16  # fixed centroids: the first 16 embeddings (no training)
_SD_SCALE = 1_000_000  # quantization: q = floor(x * 1e6) as BIGINT
# similarity threshold as an exact rational: sim >= _SD_T_NUM/100
# (compared as d*d*100^2 >= T_NUM^2 * |a|^2 * |b|^2 in DECIMAL — no floats)
_SD_T_NUM = 35


def quantized(vec: Column, scale: int = _SD_SCALE) -> Column:
    """array<double> -> array<long> by floor(x*scale): floor of an
    identical double product is bit-deterministic across engines."""
    return F.transform(vec, lambda x: F.floor(x * scale).cast("long"))


def idot(a: Column, b: Column) -> Column:
    """Exact integer dot product (long fold; |q|<=~5.4e5 at scale 1e6 and
    64 dims keeps every partial sum far below 2^63)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def _quantized_centroid_lit(cent_vecs: list[list[int]]):
    """Literal array-of-structs (i, cv, nc) for a bounded centroid set."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.array(*[F.lit(int(x)) for x in cv]).alias("cv"),
                F.lit(sum(int(x) * int(x) for x in cv)).alias("nc"),
            )
            for i, cv in enumerate(cent_vecs)
        ]
    )


def _centroid_vecs(
    q: DataFrame,
    n_centroids: int,
    centroids: list[list[float]] | None,
    caller: str,
) -> list[list[int]]:
    """Quantized centroid vectors: trained ones when given (same
    floor(x*scale) quantization the corpus gets), else the first-N
    corpus rows by id."""
    import math

    if centroids is not None:
        return [[math.floor(x * _SD_SCALE) for x in cv] for cv in centroids]
    cent_rows = q.filter(F.col("vec_id") < n_centroids).orderBy("vec_id").collect()
    if not cent_rows:
        raise ValueError(
            f"{caller}: no rows with id < {n_centroids} to use as fixed "
            "centroids — pass centroids= (e.g. from ivf_train_centroids) "
            "or re-key the corpus"
        )
    return [list(r.qv) for r in cent_rows]


def semantic_dedup(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = _SD_CENTROIDS,
    threshold_pct: int = _SD_T_NUM,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup over (id, vector): assign each vector to its nearest
    centroid (pass `centroids` from ivf_train_centroids in production;
    defaults to the first `n_centroids` rows by id), then within each
    cell mark every item that has a >= threshold cosine neighbor with a
    smaller id as a duplicate of the smallest such neighbor.

    Scale design: the pairwise stage self-joins per cell, so pair work
    is sum(cell²) — more centroids → smaller cells. The literal-array
    assignment below is right for a bounded centroid set (≲ a few
    hundred); at SemDeDup's web-scale ~100k clusters use the persistent
    path instead (build_ivf_index(..., centroids=...) +
    ann_index.match_semantic_index — Arrow-batched assignment, cell-dir
    pruning). The corpus is scanned twice (assignment, pairs) with the
    assigned+quantized projection materialized between. All similarity
    comparisons are exact integer DECIMAL arithmetic over quantized
    vectors — reproducible across partitionings and engines.
    """
    q = corpus.select(
        F.col(id_col).alias("vec_id"), quantized(as_double(F.col(vec_col))).alias("qv")
    )
    # Bounded collect (n_centroids rows, same pattern as
    # ivf_assign_fixed_centroids): folding the centroids into a literal
    # array constant makes assignment a pure per-row expression — no
    # crossJoin row blowup, no per-vec window shuffle.
    cent_lit = _quantized_centroid_lit(
        _centroid_vecs(q, n_centroids, centroids, "semantic_dedup")
    )
    # argmax key dot/|c| (|v| constant per row): exact-integer inputs cast
    # to double through ONE division + ONE sqrt — identical IEEE shape in
    # DuckDB, so the argmax is bit-deterministic, not just ulp-separated.
    # array_max over (key, -i) structs = max key, ties to the lower
    # centroid index; a NULL key (zero vector) sorts below any non-null,
    # matching the oracle's NULLS LAST.
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            F.when(
                c["nc"] > 0,
                idot(F.col("qv"), c["cv"]).cast("double")
                / F.sqrt(c["nc"].cast("double")),
            ).alias("key"),
            (-c["i"]).alias("negi"),
        ),
    )
    assigned = (
        q.select(
            "vec_id",
            "qv",
            (-F.array_max(scored)["negi"]).cast("int").alias("cell"),
            idot(F.col("qv"), F.col("qv")).alias("nn"),
        )
        .transform(materialize)
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    d = idot(F.col("a.qv"), F.col("b.qv"))
    dec = "decimal(38,0)"
    sim_ok = (d > 0) & (
        d.cast(dec) * d.cast(dec) * F.lit(10_000).cast(dec)
        >= F.lit(threshold_pct * threshold_pct).cast(dec)
        * F.col("a.nn").cast(dec)
        * F.col("b.nn").cast(dec)
    )
    dups = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(sim_ok)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )
    return (
        assigned.join(dups, "vec_id", "left")
        .select("vec_id", "cell", "dup_of", F.col("dup_of").isNull().alias("is_kept"))
    )


_SEMDEDUP_SQL = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {_SD_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, qv AS cv,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nc
  FROM v WHERE vec_id < {_SD_CENTROIDS}
), sims AS (
  SELECT v.vec_id, v.qv, c.i,
         CASE WHEN c.nc > 0 THEN
           CAST(list_dot_product(v.qv::DOUBLE[], c.cv::DOUBLE[]) AS DOUBLE)
             / sqrt(CAST(c.nc AS DOUBLE)) END AS key
  FROM v CROSS JOIN cents c
), best AS (
  SELECT vec_id, qv, i,
         row_number() OVER (PARTITION BY vec_id ORDER BY key DESC NULLS LAST, i) AS rn
  FROM sims
), asg AS (
  SELECT vec_id, qv, CAST(i AS INT) AS cell,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nn
  FROM best WHERE rn = 1
), pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(list_dot_product(a.qv::DOUBLE[], b.qv::DOUBLE[]) AS HUGEINT) AS d,
         a.nn::HUGEINT AS na, b.nn::HUGEINT AS nb
  FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id
), dups AS (
  SELECT ib AS vec_id, MIN(ia) AS dup_of
  FROM pairs
  WHERE d > 0 AND d*d*10000 >= {_SD_T_NUM * _SD_T_NUM}*na*nb
  GROUP BY ib
)
SELECT asg.vec_id, cell, dup_of, dup_of IS NULL AS is_kept
FROM asg LEFT JOIN dups ON asg.vec_id = dups.vec_id
"""


@query("semantic_dedup", _SEMDEDUP_SQL)
def semantic_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the first-{_SD_CENTROIDS} embeddings as fixed
    centroids and an exact integer threshold of {_SD_T_NUM}/100 —
    the full cluster → in-cell pair → keep/drop decision under the
    exact hash gate (only centroid *training* stays out, as with the
    IVF family)."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return semantic_dedup(e, "vec_id", "embedding")


# --- sparse tf-cosine all-pairs over shingles ----------------------------

_SC_SHINGLE_N = 3
_SC_DF_CAP = 64  # shared with the jaccard family: hot shingles are skew bombs
# sim >= _SC_T_NUM/10 compared as d*d*100 >= T^2 * na * nb (exact longs)
_SC_T_NUM = 5


def shingle_tf(d: DataFrame, n: int = _SC_SHINGLE_N) -> DataFrame:
    """(doc_id, shingle-hash, tf) with multiplicity — unlike
    word_shingles (set semantics for Jaccard), cosine needs raw term
    frequencies. Shingles are 64-bit xxhash64 keys, not strings (same
    trade as shingle_hashes: ~5x cheaper shuffle/compare, counts equal
    up to 64-bit collisions)."""
    tok = d.select("doc_id", word_tokens(F.col("text")).alias("tokens"))
    gen = F.when(
        F.size("tokens") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("tokens") - (n - 1)),
            lambda i: F.xxhash64(
                *[F.element_at(F.col("tokens"), i + k) for k in range(n)]
            ),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)"))
    sh = (
        tok.select("doc_id", F.explode_outer(gen).alias("s"))
        .filter(F.col("s").isNotNull())
    )
    return sh.groupBy("doc_id", "s").agg(F.count(F.lit(1)).alias("tf"))


def sparse_cosine_pairs(
    d: DataFrame,
    shingle_n: int = _SC_SHINGLE_N,
    df_cap: int = _SC_DF_CAP,
    threshold_tenths: int = _SC_T_NUM,
) -> DataFrame:
    """All-pairs tf-cosine >= threshold over the df<=cap shingle
    vocabulary, via an inverted index.

    Scale design mirrors ngram_jaccard_pairs: two-phase df-cap (the hot
    shingle is dropped as a (shingle, df) row and never aggregates a doc
    list), collect_list buffers bounded by df_cap, pair work
    sum(df²) <= cap * |postings|. Norms are over the same capped
    vocabulary, so the similarity is well-defined and both engines
    agree exactly (integer tf arithmetic throughout; the reported `sim`
    is one identical div/sqrt shape over exact integers).
    """
    tf = shingle_tf(d, shingle_n).transform(materialize)
    dfc = tf.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    vocab = dfc.filter(F.col("df") <= df_cap).select("s")
    kept = tf.join(vocab, "s", "left_semi")
    nrm = kept.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("nn"))
    pairable = dfc.filter((F.col("df") >= 2) & (F.col("df") <= df_cap)).select("s")
    groups = (
        kept.join(pairable, "s", "left_semi")
        .groupBy("s")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "tf"))).alias("docs"))
    )
    docs = F.col("docs")
    combos = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(docs) - 1),
            lambda i: F.transform(
                F.sequence(i + 1, F.size(docs)),
                lambda j: F.struct(
                    F.element_at(docs, i)["doc_id"].alias("doc_a"),
                    F.element_at(docs, j)["doc_id"].alias("doc_b"),
                    (F.element_at(docs, i)["tf"] * F.element_at(docs, j)["tf"]).alias("p"),
                ),
            ),
        )
    )
    dots = (
        groups.select(F.explode(combos).alias("c"))
        .select("c.doc_a", "c.doc_b", "c.p")
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("p").alias("dot_tt"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nn").alias("nn_a"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nn").alias("nn_b"))
    t2 = threshold_tenths * threshold_tenths
    # widen BEFORE multiplying: dot_tt/nn reach ~1e9 on repetitive docs
    # (one spammy phrase at tf~3e4 under the df-cap), so the squared
    # comparison overflows BIGINT — same decimal(38,0)/HUGEINT shape as
    # semantic_dedup
    dec = "decimal(38,0)"
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.col("dot_tt").cast(dec) * F.col("dot_tt").cast(dec) * F.lit(100).cast(dec)
            >= F.lit(t2).cast(dec) * F.col("nn_a").cast(dec) * F.col("nn_b").cast(dec)
        )
        .select(
            "doc_a",
            "doc_b",
            "dot_tt",
            "nn_a",
            "nn_b",
            (
                F.col("dot_tt").cast("double")
                / F.sqrt(F.col("nn_a").cast("double") * F.col("nn_b").cast("double"))
            ).alias("sim"),
        )
    )


_SPARSE_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
), sh AS (
  SELECT doc_id,
         unnest(CASE WHEN len(tokens) >= {_SC_SHINGLE_N}
           THEN list_transform(
                  generate_series(1, len(tokens) - {_SC_SHINGLE_N - 1}),
                  i -> concat_ws(' ', tokens[i], tokens[i+1], tokens[i+2]))
           ELSE [] END) AS s
  FROM t
), tf AS (
  SELECT doc_id, s, count(*)::BIGINT AS tf FROM sh GROUP BY 1, 2
), vocab AS (
  SELECT s FROM tf GROUP BY s HAVING count(*) <= {_SC_DF_CAP}
), kept AS (
  SELECT tf.* FROM tf JOIN vocab USING (s)
), nrm AS (
  SELECT doc_id, CAST(sum(tf*tf) AS BIGINT) AS nn FROM kept GROUP BY 1
), dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(sum(a.tf*b.tf) AS BIGINT) AS dot_tt
  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, dot_tt, na.nn AS nn_a, nb.nn AS nn_b,
       CAST(dot_tt AS DOUBLE)
         / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE)) AS sim
FROM dots
JOIN nrm na ON doc_a = na.doc_id
JOIN nrm nb ON doc_b = nb.doc_id
WHERE dot_tt::HUGEINT * dot_tt * 100 >= {_SC_T_NUM * _SC_T_NUM} * na.nn::HUGEINT * nb.nn
"""


@query("sparse_cosine_shingles", _SPARSE_SQL)
def sparse_cosine_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by {_SC_SHINGLE_N}-word-shingle tf-cosine >=
    0.{_SC_T_NUM} — the cosine companion to dedup_ngram_jaccard, same
    inverted-index/df-cap scale shape, exact integer arithmetic."""
    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    return sparse_cosine_pairs(d)


# --- kNN majority label vote ---------------------------------------------

_KNN_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv, label FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, label,
         list_dot_product(qv, cv) /
           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
  FROM c, q WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id, label,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
), votes AS (
  SELECT query_id, label, COUNT(*) AS votes
  FROM ranked WHERE rank <= {TOP_K}
  GROUP BY 1, 2
), winner AS (
  SELECT query_id, label AS pred_label, votes,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY votes DESC, label) AS vr
  FROM votes
)
SELECT w.query_id, e.label AS true_label, w.pred_label, w.votes
FROM winner w JOIN embeddings e ON w.query_id = e.vec_id
WHERE w.vr = 1
"""


@query("knn_label_vote", _KNN_SQL)
def knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification by majority vote of the top-{TOP_K} cosine
    neighbors' labels (ties to the smaller label). The ranking reuses
    cosine_topk (already gate-proven); the vote itself is exact integer
    counting, so the whole classifier sits under the hash gate."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    topk = cosine_topk(e, e.filter(F.col("vec_id") % QUERY_STRIDE == 0), "vec_id", "embedding")
    votes = (
        topk.join(e.select(F.col("vec_id").alias("neighbor_id"), "label"), "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    winner = (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )
    truth = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("true_label"))
    return winner.join(truth, "query_id").select(
        "query_id", "true_label", "pred_label", "votes"
    )


# --- exact winsorization report ------------------------------------------

_WZ_LO_PCT = 5
_WZ_HI_PCT = 95

_WINSOR_SQL = f"""
WITH r AS (
  SELECT event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL
), bounds AS (
  SELECT event_type, MAX(n) AS n,
         MIN(CASE WHEN rk = ({_WZ_LO_PCT} * n + 99) // 100
                  THEN value END) AS lo,
         MIN(CASE WHEN rk = ({_WZ_HI_PCT} * n + 99) // 100
                  THEN value END) AS hi
  FROM r GROUP BY event_type
)
SELECT b.event_type, b.n, b.lo, b.hi,
       CAST(sum(CASE WHEN e.value < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       CAST(sum(CASE WHEN e.value > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM events e JOIN bounds b ON e.event_type = b.event_type
WHERE e.value IS NOT NULL
GROUP BY 1, 2, 3, 4
"""


def winsorize_bounds(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    lo_pct: int = _WZ_LO_PCT,
    hi_pct: int = _WZ_HI_PCT,
    exact: bool = True,
    accuracy: int | None = None,
) -> DataFrame:
    """Per-key winsorization report: (key, n, lo, hi, n_below, n_above)
    with lo/hi the p{{lo_pct}}/p{{hi_pct}} DISC order statistics
    (element at rank ceil(p*n)) over non-NULL values and
    n_below/n_above the clamp counts. The shared boundary core
    (operators/quantiles.group_quantile_bounds) supplies both modes:
    ``exact=True`` is the hash-gated rank window; ``exact=False`` is the
    percentile_approx scale path — no per-key sort window, bit-equal to
    exact whenever ``accuracy`` covers the largest key
    (``accuracy=None``, the default, derives that covering accuracy
    from the data so the precondition is enforced, not assumed)."""
    from fastetl_spark.operators.quantiles import group_quantile_bounds

    nn = df.filter(F.col(value_col).isNotNull())
    b = group_quantile_bounds(
        nn,
        key_col,
        value_col,
        [(lo_pct, 100), (hi_pct, 100)],
        order_col=order_col,
        exact=exact,
        accuracy=accuracy,
    ).select(
        key_col,
        F.col("bounds")[0].alias("lo"),
        F.col("bounds")[1].alias("hi"),
    )
    v = F.col(value_col).cast("double")
    return (
        nn.join(broadcast(b), key_col)
        .groupBy(key_col, "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((v < F.col("lo")).cast("long")).alias("n_below"),
            F.sum((v > F.col("hi")).cast("long")).alias("n_above"),
        )
        .select(key_col, "n", "lo", "hi", "n_below", "n_above")
    )


@query("winsorize_event_values", _WINSOR_SQL)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DISC-rank p{_WZ_LO_PCT}/p{_WZ_HI_PCT} winsorization bounds
    per event_type plus clamp counts, through the shared boundary core
    (operators/quantiles). Unlike the GK-sketch quantiles
    (tolerance-tested), the order statistic at rank ceil(p*n) — pure
    integer arithmetic, no float may touch the rank — is exact and
    tie-order-invariant, and the bounds are parquet-passthrough doubles,
    so the whole report is hash-gateable. One window pass for bounds,
    one broadcast-join pass for counts; winsorize_bounds(exact=False)
    is the sketch-boundary scale twin."""
    ev = read_table(spark, sf_dir, "events")
    return winsorize_bounds(ev, "event_type", "value", "event_id")


@query("winsorize_sketch_bounds", _WINSOR_SQL)
def winsorize_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization through the sketch-boundary SCALE plan
    (winsorize_bounds(exact=False)) under the same exact oracle as
    `winsorize_event_values`: percentile_approx at covering accuracy IS
    the disc-rank order statistic, so the no-sort-window plan is
    hash-gated, not merely tolerance-tested. The covering accuracy is
    DERIVED (accuracy=None), so the gate keeps holding at any scale
    factor instead of silently degrading past a hardcoded constant."""
    ev = read_table(spark, sf_dir, "events")
    return winsorize_bounds(
        ev, "event_type", "value", "event_id", exact=False, accuracy=None
    )


# --- incremental semantic dedup (increment vs corpus) --------------------

_SD_INC_MOD = 7  # increment = vec_id % 7 == 0, corpus = the rest


def semantic_dedup_increment(
    corpus: DataFrame,
    increment: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = _SD_CENTROIDS,
    threshold_pct: int = _SD_T_NUM,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Daily-batch SemDeDup: match an increment against the corpus in
    embedding space without any corpus-corpus pair work — the embedding
    twin of dedup_increment_vs_corpus. Both sides are assigned to the
    same centroids (pass `centroids` from a trained quantizer; defaults
    to the CORPUS id range); pair work is |increment| x cell plus the
    intra-batch |increment|-bounded self-join, never corpus².

    Returns one row per increment vector: (vec_id, cell, dup_of,
    is_new) where dup_of is the smallest same-cell match with cosine >=
    threshold among corpus vectors (same id excluded, so a re-run
    against a corpus that already absorbed the batch cannot self-match)
    and smaller-id batch-mates (twins arriving together still dedup).
    Exact integer decisions — see semantic_dedup."""
    qc = corpus.select(
        F.col(id_col).alias("vec_id"), quantized(as_double(F.col(vec_col))).alias("qv")
    )
    qi = increment.select(
        F.col(id_col).alias("vec_id"), quantized(as_double(F.col(vec_col))).alias("qv")
    )
    cent_lit = _quantized_centroid_lit(
        _centroid_vecs(qc, n_centroids, centroids, "semantic_dedup_increment")
    )
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            F.when(
                c["nc"] > 0,
                idot(F.col("qv"), c["cv"]).cast("double")
                / F.sqrt(c["nc"].cast("double")),
            ).alias("key"),
            (-c["i"]).alias("negi"),
        ),
    )

    def assign(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            "qv",
            (-F.array_max(scored)["negi"]).cast("int").alias("cell"),
            idot(F.col("qv"), F.col("qv")).alias("nn"),
        )

    ac = assign(qc).transform(materialize)
    ai = assign(qi).transform(materialize)
    # candidates = same-cell corpus vectors (excluding the same id — a
    # re-run against a corpus that already absorbed this batch must not
    # self-match) plus same-cell smaller-id batch-mates (twins arriving
    # in ONE batch must still dedup against each other)
    other = lambda df: df.select(  # noqa: E731
        F.col("vec_id").alias("other"),
        F.col("qv").alias("oqv"),
        F.col("nn").alias("onn"),
        "cell",
    )
    inc = ai.select("vec_id", "qv", "nn", "cell")
    cand = other(ac).join(
        inc, ["cell"]
    ).filter(F.col("other") != F.col("vec_id")).unionByName(
        other(ai).join(inc, ["cell"]).filter(F.col("other") < F.col("vec_id"))
    )
    d = idot(F.col("oqv"), F.col("qv"))
    dec = "decimal(38,0)"
    sim_ok = (d > 0) & (
        d.cast(dec) * d.cast(dec) * F.lit(10_000).cast(dec)
        >= F.lit(threshold_pct * threshold_pct).cast(dec)
        * F.col("onn").cast(dec)
        * F.col("nn").cast(dec)
    )
    dups = (
        cand.filter(sim_ok)
        .groupBy("vec_id")
        .agg(F.min("other").alias("dup_of"))
    )
    return ai.select("vec_id", "cell").join(dups, "vec_id", "left").select(
        "vec_id", "cell", "dup_of", F.col("dup_of").isNull().alias("is_new")
    )


_SEMDEDUP_INC_SQL = f"""
WITH vc AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {_SD_SCALE}) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % {_SD_INC_MOD} <> 0
), vi AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {_SD_SCALE}) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id % {_SD_INC_MOD} = 0
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, qv AS cv,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nc
  FROM vc WHERE vec_id < {_SD_CENTROIDS}
), sc AS (
  SELECT v.vec_id, v.qv, c.i,
         CASE WHEN c.nc > 0 THEN
           CAST(list_dot_product(v.qv::DOUBLE[], c.cv::DOUBLE[]) AS DOUBLE)
             / sqrt(CAST(c.nc AS DOUBLE)) END AS key
  FROM vc v CROSS JOIN cents c
), bc AS (
  SELECT vec_id, qv, i,
         row_number() OVER (PARTITION BY vec_id ORDER BY key DESC NULLS LAST, i) AS rn
  FROM sc
), ac AS (
  SELECT vec_id, qv, CAST(i AS INT) AS cell,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nn
  FROM bc WHERE rn = 1
), si AS (
  SELECT v.vec_id, v.qv, c.i,
         CASE WHEN c.nc > 0 THEN
           CAST(list_dot_product(v.qv::DOUBLE[], c.cv::DOUBLE[]) AS DOUBLE)
             / sqrt(CAST(c.nc AS DOUBLE)) END AS key
  FROM vi v CROSS JOIN cents c
), bi AS (
  SELECT vec_id, qv, i,
         row_number() OVER (PARTITION BY vec_id ORDER BY key DESC NULLS LAST, i) AS rn
  FROM si
), ai AS (
  SELECT vec_id, qv, CAST(i AS INT) AS cell,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nn
  FROM bi WHERE rn = 1
), cand AS (
  SELECT i.vec_id, c.vec_id AS other, c.qv AS oqv, c.nn AS onn, i.qv, i.nn
  FROM ac c JOIN ai i ON c.cell = i.cell AND c.vec_id <> i.vec_id
  UNION ALL
  SELECT i.vec_id, j.vec_id AS other, j.qv AS oqv, j.nn AS onn, i.qv, i.nn
  FROM ai j JOIN ai i ON j.cell = i.cell AND j.vec_id < i.vec_id
), dups AS (
  SELECT vec_id, MIN(other) AS dup_of
  FROM cand
  WHERE CAST(list_dot_product(oqv::DOUBLE[], qv::DOUBLE[]) AS HUGEINT) > 0
    AND CAST(list_dot_product(oqv::DOUBLE[], qv::DOUBLE[]) AS HUGEINT)
          * CAST(list_dot_product(oqv::DOUBLE[], qv::DOUBLE[]) AS HUGEINT)
          * 10000
        >= {_SD_T_NUM * _SD_T_NUM} * onn::HUGEINT * nn::HUGEINT
  GROUP BY vec_id
)
SELECT ai.vec_id, ai.cell, dups.dup_of, dups.dup_of IS NULL AS is_new
FROM ai LEFT JOIN dups ON ai.vec_id = dups.vec_id
"""


@query("semantic_dedup_increment", _SEMDEDUP_INC_SQL)
def semantic_dedup_increment_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Increment-vs-corpus SemDeDup (vec_id % {_SD_INC_MOD} == 0 as
    today's batch) — the embedding twin of dedup_increment_vs_corpus,
    O(|increment|) pair work, exact-integer decisions."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    inc = e.filter(F.col("vec_id") % _SD_INC_MOD == 0)
    corpus = e.filter(F.col("vec_id") % _SD_INC_MOD != 0)
    return semantic_dedup_increment(corpus, inc, "vec_id", "embedding")


# --- quantile mapping normalization --------------------------------------

# 129 grid levels at exact BINARY fractions (L/128): every p is exactly
# representable as a double, so both engines' discrete-percentile index
# arithmetic sees identical inputs at identical boundaries (a 1/100
# grid would put non-representable p like 0.37 next to exact p*n
# boundaries, where convention drift could flip the chosen element).
_QM_LEVELS = 128


def _qm_sql() -> str:
    qlist = ", ".join(
        f"quantile_disc(value, {l}.0 / {_QM_LEVELS})" for l in range(_QM_LEVELS + 1)
    )
    return f"""
WITH ranked AS (
  SELECT event_id, event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS r,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
), gq AS (
  SELECT [{qlist}] AS g FROM events WHERE NOT isnan(value)
)
SELECT event_id, event_type, value,
       CAST(CASE WHEN n > 1 THEN (r - 1) * {_QM_LEVELS} // (n - 1)
                 ELSE 0 END AS BIGINT) AS level,
       g[CAST(CASE WHEN n > 1 THEN (r - 1) * {_QM_LEVELS} // (n - 1)
                   ELSE 0 END AS BIGINT) + 1] AS mapped_value
FROM ranked, gq
"""


def quantile_map_values(
    df: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    levels: int = _QM_LEVELS,
    exact: bool = True,
    accuracy: int | None = None,
) -> DataFrame:
    """Quantile-mapping normalization core: every row's value replaced
    by the GLOBAL distribution's value at (approximately) the same
    per-key relative rank, via a ``levels + 1``-point global
    percentile_disc grid. Returns (order, key, value, level,
    mapped_value); NULL values are dropped.

    ``exact=True`` (the gated form): per-key EXACT ranks on the
    bucketed prefix-sum primitive (ranks.grouped_row_ranks), level =
    (r-1)*levels div (n-1) — exact integer arithmetic, hash-gated, and
    since r14 partitioned by (key, bucket) instead of the key alone
    (the r13 VERDICT finding: a window partitioned by a 5-value
    dictionary column is 5 tasks holding ~20 TB each at 100 TB).
    ``exact=False`` (the sketch alternative): level = # of per-key
    percentile_approx grid boundaries the value REACHES
    (operators/quantiles, strict=False binning) — sketch accuracy, no
    rank pass. The two conventions agree to within one level on
    distinct values (|floor(r*L/n) - floor((r-1)*L/(n-1))| <= L/n + 1);
    the approx mode is an estimator, not a bit-exact twin — use it when
    even the compressed (key, value) support is the risk, not the
    answer's last ulp.

    NULL *and NaN* values are dropped symmetrically on the rank side,
    the grid side and the DuckDB oracle (the r13 ADVICE finding: the
    grid path filtered NaN via exact_quantiles_global while the rank
    window kept them, so a NaN-bearing corpus would have diverged)."""
    e = df.filter(
        F.col(value_col).isNotNull() & ~F.isnan(value_col)
    ).select(
        F.col(order_col).alias("__o"),
        F.col(key_col).alias("__k"),
        F.col(value_col).alias("__v"),
    )
    # Global grid via DISTRIBUTED exact DISC selection, not a
    # percentile_disc aggregate: percentile_disc is a gathering
    # TypedImperativeAggregate — its keyless merge funnels the FULL
    # value multiset through one task x (levels+1) buffers, which OOMs
    # a default-heap session at sf0.1 and is a hard stop at 100 TB (the
    # r12 audit finding).  The selection picks the identical lower-DISC
    # element (k = ceil(p*n), same rule as percentile_disc's
    # first-cume_dist>=p) with hash exchanges only, so the grid values
    # — and every downstream hash — are unchanged.  The 129 grid rows
    # fold to one array row through constant-size conditional-max
    # buffers (no collect_list: keep the keyless merge non-gathering).
    probs = [(l, levels) for l in range(levels + 1)]
    if exact:
        from fastetl_spark.operators.rank_quantiles import _probs_df
        from fastetl_spark.operators.ranks import (
            bucketed_cum_sum,
            drop_partition_level,
            grouped_row_ranks,
            totals_to_offsets,
        )

        # Per-row ranks ride the (key, value) support; the SAME
        # materialize + totals collect also serves the global grid
        # below (per-value global counts are the support summed over
        # keys; per-bucket global offsets are the totals summed
        # driver-side) — two bounded eager jobs for BOTH passes, the
        # fused-collect pattern of evaluation.auc_from_score_counts.
        ranked, sup, bounds, totals = grouped_row_ranks(
            e, "__k", "__v", "__o", rank_col="r", n_col="n"
        )
        lv = ranked.withColumn(
            "level",
            F.when(
                F.col("n") > 1,
                F.expr(f"CAST((r - 1) * {levels} div (n - 1) AS BIGINT)"),
            ).otherwise(F.lit(0).cast("long")),
        )
        gtot = drop_partition_level(totals)
        n_total = sum(t for _, t in gtot)
        gsup = sup.groupBy("__v").agg(
            F.sum("cnt").cast("long").alias("__gc")
        )
        gcum = bucketed_cum_sum(
            gsup,
            "__v",
            "__gc",
            bounds=bounds,
            inclusive=True,
            out_col="cum",
            offsets=totals_to_offsets(gtot, len(bounds) + 1),
        )
        q = (
            gcum.crossJoin(_probs_df(df.sparkSession, probs))
            .withColumn("n_total", F.lit(n_total).cast("long"))
            .filter(
                F.col("cum")
                >= F.expr("(p_num * n_total + p_den - 1) DIV p_den")
            )
            .groupBy("p_num", "p_den")
            .agg(F.min("__v").alias("value"))
        )
    else:
        from fastetl_spark.operators.rank_quantiles import (
            exact_quantiles_global,
        )

        q = exact_quantiles_global(e, "__v", probs=probs)
    glob = q.agg(
        F.array(
            *[
                F.max(F.when(F.col("p_num") == l, F.col("value")))
                for l in range(levels + 1)
            ]
        ).alias("g")
    )
    if not exact:
        from fastetl_spark.operators.quantiles import (
            bin_by_bounds,
            group_quantile_bounds,
        )

        b = group_quantile_bounds(
            e,
            "__k",
            "__v",
            [(l, levels) for l in range(1, levels + 1)],
            order_col="__o",
            exact=False,
            accuracy=accuracy,
        )
        lv = e.join(broadcast(b), "__k").withColumn(
            "level",
            bin_by_bounds(
                F.col("__v").cast("double"), F.col("bounds"), strict=False
            ).cast("long"),
        )
    return lv.crossJoin(broadcast(glob)).select(
        F.col("__o").alias(order_col),
        F.col("__k").alias(key_col),
        F.col("__v").alias(value_col),
        "level",
        F.element_at(F.col("g"), F.col("level").cast("int") + 1).alias(
            "mapped_value"
        ),
    )


@query("quantile_mapping_normalize", _qm_sql())
def quantile_mapping_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-mapping normalization (the rank-based feature transform
    robust to per-group scale drift): each event's value is replaced by
    the GLOBAL distribution's value at the same relative rank, via a
    {_QM_LEVELS + 1}-level discrete-quantile grid. The per-group
    relative rank is pure integer arithmetic ((r-1)*{_QM_LEVELS} div
    (n-1)); the grid itself is percentile_disc at exact binary
    fractions, so every mapped value is an actual data element both
    engines pick identically.

    Scale shape (r14): per-row ranks ride ranks.grouped_row_ranks —
    the (event_type, value) support's cumulative counts partition by
    (event_type, BUCKET), never by the 5-value event_type dictionary
    alone (the r13 VERDICT finding: a per-key rank window here was 5
    tasks sorting ~20 TB each at 100 TB), with the within-tie
    row_number partitioned by (event_type, value) — support-scale
    cardinality.  The {_QM_LEVELS + 1} global grid values come by
    distributed exact rank selection FROM THE SAME support and totals
    collect (two bounded driver jobs total; NOT a percentile_disc
    gather — that shape buffered the full value multiset in one
    keyless-merge task and OOM'd a default-heap session at sf0.1),
    broadcast back — no global sort, no per-row global rank, no
    gathered value lists, no dictionary-keyed window."""
    e = ensure_parallelism(read_table(spark, sf_dir, "events")).select(
        "event_id", "event_type", "value"
    )
    return quantile_map_values(e, "event_type", "value", "event_id").select(
        "event_id", "event_type", "value", "level", "mapped_value"
    )
