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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

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
) -> DataFrame:
    """Size-gated top-k: exact brute force under the gate, hyperplane-LSH
    bucketed search above it. The brute-force cross join is |Q|x|N|x d
    work — correct as the small-corpus oracle, a scale-killer as the
    default — so corpora past `max_bruteforce_rows` take the bucketed
    path whose pairwise work is proportional to bucket collisions (no
    crossJoin in the plan). The corpus count is a metadata-cheap action
    for parquet sources."""
    if corpus.count() <= max_bruteforce_rows:
        return cosine_topk(corpus, queries, id_col, vec_col, k)
    return lsh_topk(corpus, queries, id_col, vec_col, k)


@query("embedding_cosine_topk", _TOPK_SQL)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{TOP_K} cosine neighbors for every {QUERY_STRIDE}th vector.
    Only integer (query, neighbor, rank) triples are emitted — the float
    scores stay internal so the result is hash-stable. Routed through the
    size gate: exact at oracle scale, LSH-bucketed on a large corpus."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    queries = e.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    return ann_topk(e, queries, "vec_id", "embedding").select(
        "query_id", "neighbor_id", "rank"
    )


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


@query("similarity_lsh_bucketed")  # approximate — rows-only check
def similarity_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return lsh_topk(e, e.filter(F.col("vec_id") % QUERY_STRIDE == 0), "vec_id", "embedding")


# --- IVF ANN (k-means coarse quantizer, scale path #2) -------------------

IVF_K = 16  # coarse cells
IVF_NPROBE = 3  # cells searched per query
IVF_ITERATIONS = 3  # Lloyd refinement rounds


def _nearest_centroid(vec_col: str, centroids: list[tuple[int, list[float]]]):
    """Argmin-distance centroid id as a native expression: centroids are
    a handful of literal arrays, so the comparison unrolls into the plan
    (no join, no UDF)."""
    best_id = F.lit(centroids[0][0])
    best_d = dot(F.col(vec_col), F.array(*[F.lit(x) for x in centroids[0][1]]))
    # cosine-ish assignment on normalized vectors: maximize dot product
    for cid, cv in centroids[1:]:
        d = dot(F.col(vec_col), F.array(*[F.lit(x) for x in cv]))
        best_id = F.when(d > best_d, F.lit(cid)).otherwise(best_id)
        best_d = F.greatest(best_d, d)
    return best_id


def ivf_train_centroids(
    corpus: DataFrame,
    vec_col: str,
    k: int = IVF_K,
    iterations: int = IVF_ITERATIONS,
    id_col: str | None = None,
) -> list[tuple[int, list[float]]]:
    """Deterministic k-means coarse quantizer: seeds are an id-ordered
    sample (no RNG — reproducible across runs/cluster sizes/partition
    layouts; a bare limit() would not be), refined with a few Lloyd
    rounds. Each round is one scan + one groupBy shuffle; per-dimension
    means use d avg() aggregates (d is small and fixed for an embedding
    column). Centroids live on the driver (k*d floats) and are broadcast
    into the plan as literals."""
    base = corpus
    order = [F.col(id_col)] if id_col else []
    vecs = base.select(
        *( [F.col(id_col)] if id_col else [] ),
        as_double(F.col(vec_col)).alias("v"),
    ).withColumn("vn", l2_norm(F.col("v"))).filter(F.col("vn") > 0).select(
        *( [F.col(id_col)] if id_col else [] ),
        F.transform("v", lambda x: x / F.col("vn")).alias("v"),
    )
    d = len(vecs.first()["v"])
    seed_src = vecs.orderBy(*order) if order else vecs
    seeds = [r["v"] for r in seed_src.limit(k).collect()]
    centroids = list(enumerate(seeds))
    for _ in range(iterations):
        assigned = vecs.withColumn("cell", _nearest_centroid("v", centroids))
        means = (
            assigned.groupBy("cell")
            .agg(*[F.avg(F.col("v")[i]).alias(f"m{i}") for i in range(d)])
            .collect()
        )
        centroids = [
            (int(r["cell"]), [float(r[f"m{i}"]) for i in range(d)]) for r in means
        ]
        centroids.sort(key=lambda c: c[0])
    return centroids


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
    recall/cost point. The cell assignment is a native expression over
    literal centroids: scan + one groupBy-free equi-join on cell id, no
    crossJoin. At 100 TB the assigned corpus would be written once,
    partitioned by cell (partition pruning turns a query into nprobe
    partition reads)."""
    centroids = ivf_train_centroids(corpus, vec_col, k=n_cells, id_col=id_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", l2_norm(F.col("cv")))
    c = c.withColumn("cell", _nearest_centroid("cv", centroids)).localCheckpoint()
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", l2_norm(F.col("qv")))

    # nprobe nearest cells per query, as an unrolled sort over k literal dots
    probe_cells = F.slice(
        F.transform(
            F.array_sort(
                F.array(*[
                    F.struct(
                        (-dot(F.col("qv"), F.array(*[F.lit(x) for x in cv])) / F.col("qn")).alias("negd"),
                        F.lit(cid).alias("cid"),
                    )
                    for cid, cv in centroids
                ])
            ),
            lambda s: s["cid"],
        ),
        1,
        nprobe,
    )
    q = q.withColumn("probe", F.explode(probe_cells))
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
