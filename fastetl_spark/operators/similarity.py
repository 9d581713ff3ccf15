"""Similarity search over the `embeddings` table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (candidates come from sign-pattern buckets, so
the pairwise work is proportional to bucket collisions, not |Q|x|N|).

Scale design: the query set is broadcast (top-k is usually requested for
a small probe set); the corpus side streams through, so the plan is one
broadcast-nested-loop + a per-query top-k window — no corpus shuffle.
All arithmetic is in DOUBLE with a fixed left-to-right fold
(F.aggregate), so scores are reproducible across partitionings.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

TOP_K = 5
QUERY_STRIDE = 50  # probe set = vec_id % stride == 0


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right fold — deterministic double summation."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = TOP_K
) -> DataFrame:
    """Brute-force cosine top-k of each query vector against the corpus.
    Queries are broadcast; ties broken by neighbor id."""
    # norms are materialized per row BEFORE the pairwise join — computing
    # them inside the pair expression would redo |Q| norm folds per corpus
    # row (and vice versa)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    scored = (
        c.crossJoin(broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id % {QUERY_STRIDE} = 0
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         list_dot_product(qv, cv) /
           (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS sim
  FROM c, q WHERE neighbor_id <> query_id
), ranked AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {TOP_K}
"""


BRUTE_FORCE_MAX_ROWS = 100_000


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = TOP_K,
    max_bruteforce_rows: int = BRUTE_FORCE_MAX_ROWS,
    corpus_count: int | None = None,
) -> DataFrame:
    """Size-gated top-k: exact brute force under the gate, hyperplane-LSH
    bucketed search above it. The brute-force cross join is |Q|x|N|x d
    work — correct as the small-corpus oracle, a scale-killer as the
    default — so corpora past `max_bruteforce_rows` take the bucketed
    path whose pairwise work is proportional to bucket collisions (no
    crossJoin in the plan).

    Pass `corpus_count` when the caller already knows it: the fallback
    ``corpus.count()`` executes the corpus plan (for a bare parquet scan
    that collapses to footer row counts, but anything non-trivial —
    a repartition, a filter — pays a real pass). Both branches return
    the same (query_id, neighbor_id, rank) schema, so crossing the gate
    as data grows can never change the output contract."""
    n = corpus.count() if corpus_count is None else corpus_count
    if n <= max_bruteforce_rows:
        return cosine_topk(corpus, queries, id_col, vec_col, k).select(
            "query_id", "neighbor_id", "rank"
        )
    return lsh_topk(corpus, queries, id_col, vec_col, k)


@query("embedding_cosine_topk", _TOPK_SQL)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} cosine neighbors for every {QUERY_STRIDE}th vector.
    Only integer (query, neighbor, rank) triples are emitted — the float
    scores stay internal so the result is hash-stable. Routed through the
    size gate: exact at oracle scale, LSH-bucketed on a large corpus.
    The gate count runs on the raw scan (footer row counts) BEFORE the
    fix-up repartition, which would otherwise force a full pass."""
    raw = read_table(spark, sf_dir, "embeddings")
    n = raw.count()
    e = ensure_parallelism(raw)
    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return ann_topk(e, queries, "vec_id", "embedding", corpus_count=n)


# --- LSH-bucketed ANN (scale path) --------------------------------------

N_PLANES = 12


def hyperplane_signature(vec: Column, n_planes: int = N_PLANES) -> Column:
    """Sign pattern against deterministic pseudo-random hyperplanes.
    Plane p component d = sin(1 + p * 131 + d * 7) — fixed, seedless,
    computable on any worker without shipping plane matrices."""
    sig = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda x, d: x * F.sin(F.lit(1.0) + F.lit(p * 131).cast("double") + d.cast("double") * 7.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = TOP_K,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """ANN: random-hyperplane signatures bucket the corpus; each query
    only scores its own bucket's members, so pairwise work scales with
    bucket collisions instead of |Q|x|N|. The bucket equi-join replaces
    the brute-force crossJoin. Approximate: recall vs brute force is
    asserted in tests."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    c = c.select(
        "neighbor_id",
        "cv",
        l2_norm(F.col("cv")).alias("cn"),
        hyperplane_signature(F.col("cv"), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q = q.select(
        "query_id",
        "qv",
        l2_norm(F.col("qv")).alias("qn"),
        hyperplane_signature(F.col("qv"), n_planes).alias("qb"),
    )
    scored = c.join(
        broadcast(q), (F.col("bucket") == F.col("qb")) & (F.col("neighbor_id") != F.col("query_id"))
    ).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# DuckDB twin of the FULL hyperplane-LSH pipeline: identical plane
# constants, identical left-to-right fold order for projections/dots/
# norms (list_sum is a sequential fold, like F.aggregate), so every
# double is bit-identical across engines except the last ulp of sin()
# (Math.sin vs libm) — which only matters if a projection sits within
# ~1e-14 of zero, never the case on the fixtures. This makes the
# bucketing, the candidate set, AND the ranking exactly reproducible,
# promoting the LSH path from rows-only to a hash-verified oracle.
_LSH_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), proj AS (
  SELECT vec_id, p,
         list_sum(list_transform(range(0, len(v)),
           d -> v[d+1] * sin(1.0 + CAST(p*131 AS DOUBLE) + CAST(d AS DOUBLE)*7.0))) AS pr
  FROM e, (SELECT unnest(range(0, {N_PLANES})) AS p) planes
), sigs AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN pr > 0 THEN 1 << p ELSE 0 END) AS INT) AS bucket
  FROM proj GROUP BY vec_id
), norms AS (
  SELECT vec_id, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e
), cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_sum(list_transform(range(0, len(qe.v)),
           d -> qe.v[d+1] * ce.v[d+1])) / (qn.nrm * cn.nrm) AS sim
  FROM sigs q
  JOIN sigs c ON q.bucket = c.bucket AND c.vec_id != q.vec_id
  JOIN e qe ON qe.vec_id = q.vec_id
  JOIN e ce ON ce.vec_id = c.vec_id
  JOIN norms qn ON qn.vec_id = q.vec_id
  JOIN norms cn ON cn.vec_id = c.vec_id
  WHERE q.vec_id % {QUERY_STRIDE} = 0
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM cand) t
WHERE rank <= {TOP_K}
"""


@query("similarity_lsh_bucketed", _LSH_SQL)
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN under an EXACT oracle (see _LSH_SQL): the
    sin-plane signatures, bucket equi-join candidates, cosine scores
    and top-k ranking are all reproduced bit-for-bit in DuckDB."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return lsh_topk(e, e.filter(F.col("vec_id") % QUERY_STRIDE == 0), "vec_id", "embedding")


# --- IVF ANN (k-means coarse quantizer, scale path #2) -------------------


IVF_K = 16  # coarse cells
IVF_NPROBE = 3  # cells searched per query
IVF_ITERATIONS = 3  # Lloyd refinement rounds


def _probe_cells_udf(centroid_rows: list[list[float]], nprobe: int):
    """Arrow-batched cell assignment: nearest `nprobe` centroid ids per
    vector as ONE dense numpy matmul per batch ((n x d) @ (d x k)).

    This is the sanctioned Pandas-UDF case: a per-row argmin over k
    centroids as native higher-order expressions is interpreted
    (no codegen) and re-folds k dot products per row — measured 10x
    slower than the Arrow/numpy path. Centroids travel in the closure
    (k*d floats, broadcast with the serialized task)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroid_rows, dtype=np.float64)  # k x d

    @pandas_udf("array<int>")
    def probe(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        M = np.stack(vecs.to_numpy()).astype(np.float64)  # n x d
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        sims = (M / norms) @ C.T  # n x k cosine vs unit-normalized centroids
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return probe


IVF_TRAIN_SAMPLE = 16_384  # quantizer training sample (driver-sized)


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str,
    k: int = IVF_K,
    iterations: int = IVF_ITERATIONS,
    id_col: str | None = None,
    train_sample: int = IVF_TRAIN_SAMPLE,
) -> list[list[float]]:
    """Deterministic k-means coarse quantizer, trained on a BOUNDED
    driver-side sample (the id-ordered prefix — no RNG, reproducible on
    any cluster/layout) and refined with numpy Lloyd rounds entirely on
    the driver. Training the quantizer on a sample is the standard IVF
    construction (the cell structure needs only the density shape, not
    every point); the full corpus is touched exactly once, by the
    distributed assignment pass. Driver cost is k*d*|sample| flops —
    milliseconds. Empty cells keep their previous centroid. Returns
    unit-normalized centroid rows, index = cell id."""
    import numpy as np

    if id_col is None:
        # an unordered limit() is partition-layout-dependent — the
        # documented reproducibility guarantee needs a total order
        raise ValueError(
            "ivf_train_centroids requires id_col: the training sample is the "
            "id-ordered prefix; without an ordering key the quantizer (and "
            "every cell assignment) would change with the data layout"
        )
    vecs = corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
    rows = vecs.orderBy(F.col(id_col)).limit(train_sample).collect()
    if not rows:
        raise ValueError("ivf_train_centroids: corpus is empty")
    M = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    M = M[norms[:, 0] > 0] / norms[norms[:, 0] > 0]
    if len(M) == 0:
        raise ValueError("ivf_train_centroids: no nonzero vectors in training sample")
    C = M[:k].copy()  # id-ordered seeds
    for _ in range(iterations):
        cells = np.argmax(M @ C.T, axis=1)
        for c in range(k):
            members = M[cells == c]
            if len(members):
                mean = members.mean(axis=0)
                n = np.linalg.norm(mean)
                if n > 0:
                    C[c] = mean / n
    return [list(map(float, row)) for row in C]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = TOP_K,
    n_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """IVF ANN: corpus partitioned into coarse cells by nearest centroid;
    each query exactly reranks only its `nprobe` closest cells. Pairwise
    work is |Q| x (nprobe/k) x |N| — tune k ~ sqrt(N) and nprobe for the
    recall/cost point. Cell assignment is one Arrow-batched matmul per
    batch; search is a cell equi-join (broadcast queries), no crossJoin.
    At 100 TB the assigned corpus would be written once, partitioned by
    cell — partition pruning then turns a query into nprobe partition
    reads."""
    centroids = ivf_train_centroids(corpus, vec_col, k=n_cells, id_col=id_col)
    assign1 = _probe_cells_udf(centroids, 1)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    c = c.withColumn("cell", F.element_at(assign1("cv"), 1)).transform(materialize)
    probe_n = _probe_cells_udf(centroids, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    q = q.withColumn("probe", F.explode(probe_n("qv")))
    scored = c.join(
        broadcast(q),
        (F.col("cell") == F.col("probe")) & (F.col("neighbor_id") != F.col("query_id")),
    ).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


@query("similarity_ivf")  # approximate — rows-only check
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return ivf_topk(e, e.filter(F.col("vec_id") % QUERY_STRIDE == 0), "vec_id", "embedding")


# --- per-dimension embedding sanity profile ------------------------------

# comparison/count-only stats (no float arithmetic): distributed float
# SUMs are order-dependent across engines, so a mean/std column could
# never hash-match an oracle — while count/min/max/zero/nonfinite are
# exact on any engine and are what an embedding-QA gate actually checks
# (dead dims, exploded dims, NaN leakage from a bad encoder shard).
_DIM_PROFILE_SQL = """
WITH ex AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         unnest(embedding) AS v
  FROM embeddings
)
SELECT CAST(dim AS INTEGER) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(v) AS min_v,
       MAX(v) AS max_v,
       CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
       CAST(SUM(CASE WHEN isnan(v) OR isinf(v) THEN 1 ELSE 0 END) AS BIGINT)
           AS n_nonfinite
FROM ex GROUP BY dim
"""


@query("embedding_dim_profile", _DIM_PROFILE_SQL)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding QA profile: row count, min/max, zero and
    non-finite counts — the pre-flight gate before ANN indexing or
    training (a dead dimension, a blown-up dimension, or NaNs from one
    bad encoder shard each corrupt a whole similarity index).

    One scan + posexplode + a single (dim)-keyed aggregate with map-side
    partials; output is |dims| rows regardless of corpus size."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    ex = e.select(F.posexplode("embedding").alias("dim0", "v"))
    nonfinite = F.isnan("v") | F.col("v").isin(float("inf"), float("-inf"))
    return (
        ex.groupBy((F.col("dim0") + 1).cast("int").alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
            F.sum(F.when(F.col("v") == 0, 1).otherwise(0)).cast("long").alias("n_zero"),
            F.sum(F.when(nonfinite, 1).otherwise(0)).cast("long").alias("n_nonfinite"),
        )
    )


# --- IVF-PQ: product-quantized ANN (the billion-scale memory shape) ------

PQ_M = 8      # subspaces (d=64 -> 8 dims each)
PQ_KSUB = 16  # codewords per subspace (4-bit codes)
PQ_REFINE = 64  # approx candidates exactly reranked per query


def pq_train_codebooks(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    train_sample: int = 16_384,
    iterations: int = 8,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks trained on the id-ordered driver
    sample (same bounded-sample contract as ivf_train_centroids).
    Returns m codebooks of ksub codewords (each d/m floats)."""
    import numpy as np

    rows = (
        corpus.select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
        .orderBy(F.col(id_col))
        .limit(train_sample)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train_codebooks: corpus is empty")
    M = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    norms = np.linalg.norm(M, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    M = M / norms
    d = M.shape[1]
    if d % m != 0:
        raise ValueError(f"pq_train_codebooks: dim {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for s in range(m):
        S = M[:, s * dsub : (s + 1) * dsub]
        C = S[:ksub].copy()  # id-ordered seeds, deterministic
        for _ in range(iterations):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books.append([list(map(float, row)) for row in C])
    return books


def _pq_encode_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched PQ encoding: per subspace, nearest-codeword id on
    the unit-normalized vector — one (n x ksub) distance matrix per
    subspace per batch. Codebooks ride the task closure (m*ksub*dsub
    floats)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    dsub = B[0].shape[1]

    @pandas_udf("array<int>")
    def encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        M = M / norms
        codes = np.empty((len(M), m), dtype=np.int32)
        for s in range(m):
            S = M[:, s * dsub : (s + 1) * dsub]
            d2 = ((S[:, None, :] - B[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d2, axis=1)
        return pd.Series(list(codes))

    return encode


def _pq_approx_sim_udf(codebooks: list[list[list[float]]]):
    """Asymmetric scoring: reconstruct each candidate from its codes and
    dot it with the unit-normalized query — vectorized gather + einsum
    per Arrow batch. The true vectors never travel with the index."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = np.stack([np.asarray(b, dtype=np.float64) for b in codebooks])  # m x ksub x dsub
    m = B.shape[0]

    @pandas_udf("double")
    def approx_sim(qvecs: pd.Series, codes: pd.Series) -> pd.Series:
        if len(qvecs) == 0:
            return pd.Series([], dtype=float)
        Q = np.stack(qvecs.to_numpy()).astype(np.float64)
        qn = np.linalg.norm(Q, axis=1, keepdims=True)
        qn[qn == 0.0] = 1.0
        Q = Q / qn
        Cd = np.stack(codes.to_numpy()).astype(np.int64)  # n x m
        # gather: n x m x dsub reconstructed subvectors, flatten to n x d
        R = B[np.arange(m)[None, :], Cd]  # n x m x dsub
        R = R.reshape(len(Cd), -1)
        return pd.Series(np.einsum("nd,nd->n", Q, R))

    return approx_sim


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = TOP_K,
    n_cells: int = IVF_K,
    nprobe: int = IVF_NPROBE,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    refine: int = PQ_REFINE,
) -> DataFrame:
    """IVF-PQ ANN: coarse cells prune the corpus (IVF), 4-bit product
    codes stand in for the vectors during candidate scoring (PQ/ADC),
    and only the top-`refine` approximate candidates per query are
    exactly reranked from the raw vectors. The index row is
    (id, cell, m codes) — ~m bytes instead of d*8: at a billion
    vectors that is the difference between an index that fits in
    cluster memory and one that does not. The raw-vector table is
    touched only for encoding (once) and the final point-lookup
    rerank join."""
    centroids = ivf_train_centroids(corpus, vec_col, k=n_cells, id_col=id_col)
    books = pq_train_codebooks(corpus, vec_col, id_col, m=m, ksub=ksub)
    assign1 = _probe_cells_udf(centroids, 1)
    encode = _pq_encode_udf(books)

    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    # the PQ index: id + cell + codes, no vectors
    index = (
        raw.select("neighbor_id", "cv")
        .withColumn("cell", F.element_at(assign1("cv"), 1))
        .withColumn("codes", encode("cv"))
        .drop("cv")
        .transform(materialize)
    )
    probe_n = _probe_cells_udf(centroids, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))
    q = q.withColumn("probe", F.explode(probe_n("qv")))

    approx = _pq_approx_sim_udf(books)
    cand = index.join(
        broadcast(q),
        (F.col("cell") == F.col("probe")) & (F.col("neighbor_id") != F.col("query_id")),
    ).withColumn("asim", approx("qv", "codes"))
    w = Window.partitionBy("query_id").orderBy(F.desc("asim"), F.asc("neighbor_id"))
    shortlist = (
        cand.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= refine)
        .select("query_id", "neighbor_id", "qv", "qn")
    )
    # exact rerank: point-lookup join back to the raw vectors
    rerank = shortlist.join(raw, on="neighbor_id").select(
        "query_id",
        "neighbor_id",
        (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


@query("similarity_ivfpq")  # approximate — rows-only check
def similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return ivfpq_topk(
        e, e.filter(F.col("vec_id") % QUERY_STRIDE == 0), "vec_id", "embedding"
    )


# --- fixed-centroid assignment: the cell-assignment UDF under the gate ----

_N_FIXED_CENTROIDS = 16

# For each vector: cosine against the first-16 embeddings as FIXED
# centroids, argmax with ties to the lower centroid index. The only
# cross-engine residue is the last-ulp of the two dot/normalize shapes
# (numpy matmul vs sequential fold) — argmax flips only on sims within
# ~1e-15 of each other, far below the ~1e-2 separation of cosines to
# distinct random centroids (same promotion argument as the sin-based
# LSH oracle).
_ASSIGN_SQL = f"""
WITH cents AS (
  SELECT embedding::DOUBLE[] AS cv,
         row_number() OVER (ORDER BY vec_id) - 1 AS i
  FROM embeddings WHERE vec_id < {_N_FIXED_CENTROIDS}
), v AS (
  SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings
), sims AS (
  SELECT v.vec_id, c.i,
         list_dot_product(ev, cv) / sqrt(list_dot_product(ev, ev)) AS sim
  FROM v CROSS JOIN cents c
), best AS (
  SELECT vec_id, i,
         row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, i) AS rn
  FROM sims
)
SELECT vec_id, CAST(i AS INT) AS cell FROM best WHERE rn = 1
"""


@query("ivf_assign_fixed_centroids", _ASSIGN_SQL)
def ivf_assign_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched cell-assignment UDF (_probe_cells_udf — the
    step every IVF build/append/search runs) under the exact gate:
    with the first-{_N_FIXED_CENTROIDS} embeddings as FIXED centroids
    there is no k-means training left, so the UDF's normalized-matmul
    argmax must agree with DuckDB's per-pair cosine argmax exactly.
    Together with the exhaustive-probe entries this leaves Lloyd
    training as the only unhashed ANN component."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    cents = [
        [float(x) for x in r.embedding]
        for r in e.filter(F.col("vec_id") < _N_FIXED_CENTROIDS)
        .orderBy("vec_id")
        .collect()
    ]
    assign1 = _probe_cells_udf(cents, 1)
    return e.select(
        "vec_id",
        F.element_at(assign1(as_double(F.col("embedding"))), 1).alias("cell"),
    )


# --- exhaustive configs of the ONE-SHOT paths (same idea as the
# ann_index exhaustive entries: nprobe=n_cells / refine=|corpus| makes
# the approximate path identical to exact top-k, so the one-shot
# probe/score/rerank code itself sits under the brute-force oracle) ---


@query("similarity_ivf_oneshot_exhaustive", _TOPK_SQL)
def similarity_ivf_oneshot_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ivf_topk at nprobe=n_cells: every cell probed, exact rerank over
    the full corpus — must hash-match the brute-force oracle."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return ivf_topk(
        e,
        e.filter(F.col("vec_id") % QUERY_STRIDE == 0),
        "vec_id",
        "embedding",
        nprobe=IVF_K,
    )


@query("similarity_ivfpq_oneshot_exhaustive", _TOPK_SQL)
def similarity_ivfpq_oneshot_exhaustive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ivfpq_topk at nprobe=n_cells and refine=|corpus|: the ADC
    shortlist passes everything, the exact rerank alone ranks — the
    one-shot PQ path under the brute-force oracle."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    # a bare parquet-scan count collapses to footer row counts —
    # deliberately NOT e.count(), which would execute the
    # ensure_parallelism repartition just to count
    n = read_table(spark, sf_dir, "embeddings").count()
    return ivfpq_topk(
        e,
        e.filter(F.col("vec_id") % QUERY_STRIDE == 0),
        "vec_id",
        "embedding",
        nprobe=IVF_K,
        refine=n,
    )


# --- margin-based mutual-kNN pairs (bitext-mining criterion) ---------------

# The Artetxe & Schwenk margin criterion (the standard bitext/parallel-
# data miner, "Margin-based Parallel Corpus Mining", ACL 2019): score a
# candidate pair not by raw cosine but by the RATIO margin
#   margin(x, y) = cos(x, y) / ((avgNN_k(x) + avgNN_k(y)) / 2)
# which discounts hubness (vectors whose neighborhood is uniformly
# close), then keep pairs that are each other's best margin match.
# Every float here is a pinned-order fold (dot products left-to-right,
# k-NN averages summed in rank order), so the mutual-pair set is
# hash-stable across engines and partitionings.

_MKNN_K = 4

_MKNN_SQL = f"""
WITH c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
), scored AS (
  SELECT a.vec_id AS src, b.vec_id AS dst, b.label AS dlabel,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS sim
  FROM c a, c b WHERE a.vec_id <> b.vec_id
), ranked AS (
  SELECT src, dst, dlabel, sim,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY sim DESC, dst) AS rnk
  FROM scored
), knn AS (
  SELECT * FROM ranked WHERE rnk <= {_MKNN_K}
), den AS (
  SELECT src, list_sum(list(sim ORDER BY rnk)) / COUNT(*) AS avg_nn
  FROM knn GROUP BY src
), margins AS (
  SELECT k.src, k.dst,
         k.sim / ((ds.avg_nn + dd.avg_nn) / 2) AS margin
  FROM knn k
  JOIN den ds ON ds.src = k.src
  JOIN den dd ON dd.src = k.dst
), best AS (
  SELECT src, dst FROM (
    SELECT src, dst,
           ROW_NUMBER() OVER (PARTITION BY src
                              ORDER BY margin DESC, dst) AS mr
    FROM margins
  ) WHERE mr = 1
), lab AS (
  SELECT vec_id, label FROM embeddings
)
SELECT b1.src AS vec_id_a, b1.dst AS vec_id_b,
       (la.label = lb.label) AS same_label
FROM best b1
JOIN best b2 ON b2.src = b1.dst AND b2.dst = b1.src
JOIN lab la ON la.vec_id = b1.src
JOIN lab lb ON lb.vec_id = b1.dst
WHERE b1.src < b1.dst
"""


def mutual_margin_pairs(corpus: DataFrame, id_col: str, vec_col: str,
                        k: int = _MKNN_K,
                        extra_cols: list[str] | None = None) -> DataFrame:
    """Mutual best-match pairs under the ratio-margin criterion: for
    each vector, rerank its cosine top-k by margin (cosine divided by
    the mean of the two endpoints' k-NN cosine averages) and keep
    pairs that pick each other.  Returns (vec_id_a, vec_id_b) with
    vec_id_a < vec_id_b, plus ``extra_cols`` from each endpoint
    prefixed a_/b_.

    Scale shape: the pairwise stage is the pluggable part — here the
    exact crossJoin baseline (the oracle form); a large corpus feeds
    the same margin/mutuality tail from LSH- or IVF-bucketed candidate
    pairs (similarity.lsh_topk / ann_index), since margin and
    mutuality only ever read each side's top-k list."""
    extra = list(extra_cols or [])
    c = corpus.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("v"),
        *extra,
    ).withColumn("vn", l2_norm(F.col("v")))
    a = c.select(
        F.col("vid").alias("src"), F.col("v").alias("av"),
        F.col("vn").alias("an"),
    )
    b = c.select(
        F.col("vid").alias("dst"), F.col("v").alias("bv"),
        F.col("vn").alias("bn"),
    )
    scored = (
        a.crossJoin(broadcast(b))
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src", "dst",
            (dot(F.col("av"), F.col("bv"))
             / (F.col("an") * F.col("bn"))).alias("sim"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    knn = scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )
    # k-NN average folded in rank order — pinned double summation;
    # divide by the ACTUAL neighbor count (a corpus with fewer than
    # k+1 vectors has shorter lists — dividing by the constant k would
    # understate avg_nn and inflate every margin)
    den = knn.groupBy("src").agg(
        (
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rnk", "sim"))
                    ),
                    lambda s: s["sim"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            / F.count(F.lit(1))
        ).alias("avg_nn")
    )
    margins = (
        knn.join(den.withColumnRenamed("src", "__s").withColumnRenamed(
            "avg_nn", "den_src"), F.col("src") == F.col("__s"))
        .drop("__s")
        .join(den.withColumnRenamed("src", "__d").withColumnRenamed(
            "avg_nn", "den_dst"), F.col("dst") == F.col("__d"))
        .drop("__d")
        .select(
            "src", "dst",
            (F.col("sim")
             / ((F.col("den_src") + F.col("den_dst")) / 2)).alias("margin"),
        )
    )
    wm = Window.partitionBy("src").orderBy(F.desc("margin"), F.asc("dst"))
    best = (
        margins.withColumn("mr", F.row_number().over(wm))
        .filter(F.col("mr") == 1)
        .select("src", "dst")
    )
    rev = best.select(F.col("src").alias("__rs"), F.col("dst").alias("__rd"))
    pairs = (
        best.join(
            rev,
            (F.col("__rs") == F.col("dst")) & (F.col("__rd") == F.col("src")),
        )
        .filter(F.col("src") < F.col("dst"))
        .select(F.col("src").alias("vec_id_a"), F.col("dst").alias("vec_id_b"))
    )
    if not extra:
        return pairs
    ea = c.select(F.col("vid").alias("vec_id_a"),
                  *[F.col(x).alias(f"a_{x}") for x in extra])
    eb = c.select(F.col("vid").alias("vec_id_b"),
                  *[F.col(x).alias(f"b_{x}") for x in extra])
    return pairs.join(ea, "vec_id_a").join(eb, "vec_id_b")


@query("mutual_margin_pairs", _MKNN_SQL)
def mutual_margin_pairs_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion mutual best matches over the embeddings table,
    with a same-label flag grading how often the miner pairs within a
    ground-truth cluster — the alignment-mining primitive for parallel/
    near-duplicate corpus construction."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    out = mutual_margin_pairs(e, "vec_id", "embedding",
                              extra_cols=["label"])
    return out.select(
        "vec_id_a", "vec_id_b",
        (F.col("a_label") == F.col("b_label")).alias("same_label"),
    )
