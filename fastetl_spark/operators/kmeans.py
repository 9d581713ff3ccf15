"""Exact-arithmetic Lloyd k-means — the TRAINING loop under the hash gate.

Round-5 verdict: assignment (`ivf_assign_fixed_centroids`) and search
(the exhaustive-probe IVF/IVF-PQ twins) are oracle-gated, but Lloyd
training itself — the one remaining ANN technique — rested on recall
tests. This module closes that gap with a fixed-iteration Lloyd over
INTEGER-QUANTIZED vectors where every step is exact:

- quantize: ``q = floor(x * 1e6)`` as BIGINT (the established trick —
  floor of an identical double product is bit-deterministic),
- assignment: argmin of the exact-integer squared L2 distance
  ``sum((q_d - c_d)^2)`` — pure BIGINT compares, ties to the lower
  centroid index; NO floats anywhere (stronger than the cosine-argmax
  gate, which still had a one-ulp IEEE shape),
- update: exact integer per-dimension sums with FLOOR division by the
  cluster count (empty clusters keep their previous centroid),
- initial centroids: the first-k corpus rows by id (no randomness).

Both engines run the identical integer recurrence, so the DuckDB
oracle reproduces the full training trajectory as unrolled CTEs (the
``_ITERATIONS``-generated-CTE pattern from ``graph.pagerank_doc_graph``)
and the final centroids hash-match bit-for-bit.

Scale shape (the real distributed-Lloyd design, same as Spark MLlib's):
per iteration, ONE map-side-combined shuffle keyed on (cell, dim) — the
centroids travel to the data as a literal broadcast expression, the data
never travels to the driver; only k*d partial sums (8*64 rows here) are
collected per iteration to fold the next centroid literal. Overflow
headroom under ANSI: |q| <= ~5.4e5 at scale 1e6, so per-dim diff^2 <=
~1.2e12 and a 64-dim distance <= ~7.4e13; per-(cell,dim) sums reach
|corpus| * 5.4e5 — BIGINT-safe beyond 1e12 rows.

Production float k-means (`similarity.ivf_train_centroids`, numpy on a
bounded sample) remains the fast path; this is its exact-config twin,
shrinking the rows-only set to pure engine-hash variants.

Reference parity: fastETL has no clustering surface; extension per
SURVEY.md §2.10-2.11 (LLM-data curation family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.operators.curation2 import _centroid_vecs, quantized
from fastetl_spark.operators.similarity import as_double
from fastetl_spark.registry import query

_KM_K = 8  # clusters: the first 8 embeddings seed the run
_KM_ITER = 2  # fixed Lloyd iterations (unrolled in the oracle)
_KM_DIMS = 64  # embedding dims in the fixture corpus
_KM_SCALE = 1_000_000


def _l2_argmin_cell(cents: list[list[int]]) -> Column:
    """Assignment expression for a bounded centroid set folded into a
    literal array: exact-integer squared-L2 argmin over ``qv``, ties to
    the lower centroid index (array_min over (d2, i) structs is a
    lexicographic BIGINT min — no floats, no ulp argument needed)."""
    cent_lit = F.array(
        *[
            F.struct(
                F.lit(i).alias("i"),
                F.array(*[F.lit(int(x)) for x in cv]).alias("cv"),
            )
            for i, cv in enumerate(cents)
        ]
    )
    scored = F.transform(
        cent_lit,
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(F.col("qv"), c["cv"], lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d2"),
            c["i"].alias("i"),
        ),
    )
    return F.array_min(scored)["i"].cast("int")


def lloyd_kmeans_exact(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = _KM_K,
    iterations: int = _KM_ITER,
    scale: int = _KM_SCALE,
) -> DataFrame:
    """Run `iterations` exact-integer Lloyd steps seeded by the first-k
    corpus rows; return the final centroids as (cell, dim, c_val,
    n_points) rows — k*d rows, the model-sized output of a training op.

    Each iteration: distributed assignment (literal-centroid argmin —
    a pure per-row expression, no join, no shuffle), then ONE shuffle
    aggregating per-(cell, dim) integer sums with map-side combine;
    the k*d partial sums are collected (bounded, centroid-sized) and
    floor-divided driver-side into the next centroid literal — Python's
    `//` is exact floor division on integers, matching the oracle's
    remainder-subtract form. Empty clusters keep their previous
    centroid, counts report 0."""
    spark = corpus.sparkSession
    q = materialize(
        corpus.select(
            F.col(id_col).alias("vec_id"),
            quantized(as_double(F.col(vec_col)), scale).alias("qv"),
        )
    )
    cents = _centroid_vecs(q, k, None, "lloyd_kmeans_exact")
    if len(cents) != k:
        raise ValueError(
            f"lloyd_kmeans_exact: seeding needs exactly k={k} rows with "
            f"id < {k}, found {len(cents)} — ids are non-contiguous; pass a "
            "corpus whose first k ids are 0..k-1 or re-key the id column"
        )
    counts = [0] * k
    for _ in range(iterations):
        assigned = q.select(_l2_argmin_cell(cents).alias("cell"), "qv")
        sums = (
            assigned.select("cell", F.posexplode("qv").alias("dim", "qe"))
            .groupBy("cell", "dim")
            .agg(F.sum("qe").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # bounded: at most k*d rows (the model, not the data)
        )
        new = [list(cv) for cv in cents]
        counts = [0] * k
        for r in sums:
            new[r["cell"]][r["dim"]] = r["s"] // r["n"]
            counts[r["cell"]] = r["n"]
        cents = new
    rows = [
        (cell, dim, int(cents[cell][dim]), int(counts[cell]))
        for cell in range(k)
        for dim in range(len(cents[cell]))
    ]
    return spark.createDataFrame(
        rows, "cell int, dim int, c_val bigint, n_points bigint"
    )


def _km_iteration_ctes(n_iter: int) -> str:
    """Unrolled Lloyd iterations as CTE chains (the generated-CTE
    pattern from pagerank_doc_graph): iteration t reads centroid rows
    c{t-1}d (cell, dim, ce) and emits c{t}d + n{t} (per-cell counts).
    DuckDB `//` truncates toward zero, so the update uses the
    remainder-subtract floor form on an exactly-divisible numerator —
    identical to Python's floor `//` on the Spark side."""
    parts = []
    for t in range(1, n_iter + 1):
        parts.append(
            f"""d{t} AS (
  SELECT vd.vec_id, c.cell, CAST(SUM((vd.qe - c.ce) * (vd.qe - c.ce)) AS BIGINT) AS d2
  FROM vd JOIN c{t - 1}d c USING (dim)
  GROUP BY vd.vec_id, c.cell
), a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM d{t}
  ) WHERE rn = 1
), s{t} AS (
  SELECT a.cell, vd.dim, CAST(SUM(vd.qe) AS BIGINT) AS s, COUNT(*) AS n
  FROM a{t} a JOIN vd USING (vec_id)
  GROUP BY a.cell, vd.dim
), c{t}d AS (
  SELECT c.cell, c.dim,
         CASE WHEN s.n IS NULL THEN c.ce
              ELSE (s.s - ((s.s % s.n + s.n) % s.n)) // s.n
         END AS ce,
         COALESCE(s.n, 0) AS n
  FROM c{t - 1}d c LEFT JOIN s{t} s ON s.cell = c.cell AND s.dim = c.dim
)"""
        )
    return ",\n".join(parts)


_KMEANS_SQL = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {_KM_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
), dims AS (
  SELECT CAST(d AS INT) AS dim FROM generate_series(0, {_KM_DIMS - 1}) t(d)
), vd AS (
  SELECT vec_id, dim, qv[dim + 1] AS qe FROM v CROSS JOIN dims
), c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cell, qv
  FROM v WHERE vec_id < {_KM_K}
), c0d AS (
  SELECT cell, dim, qv[dim + 1] AS ce, CAST(0 AS BIGINT) AS n
  FROM c0 CROSS JOIN dims
),
{_km_iteration_ctes(_KM_ITER)}
SELECT CAST(cell AS INT) AS cell, CAST(dim AS INT) AS dim,
       CAST(ce AS BIGINT) AS c_val, CAST(n AS BIGINT) AS n_points
FROM c{_KM_ITER}d
"""


@query("kmeans_lloyd_exact", _KMEANS_SQL)
def kmeans_lloyd_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means TRAINING under the exact hash gate: {_KM_ITER}
    unrolled iterations over the integer-quantized embedding corpus,
    seeded by the first-{_KM_K} rows; the oracle replays both
    iterations as generated CTEs and the final (cell, dim, c_val,
    n_points) centroid table must match bit-for-bit. With assignment
    (ivf_assign_fixed_centroids) and search (exhaustive-probe twins)
    already gated, this puts the LAST ANN component — the training
    loop itself — under the oracle; only engine-hash production
    variants (xxhash LSH, float k-means, HLL/GK sketches) remain
    rows-only."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return lloyd_kmeans_exact(e, "vec_id", "embedding")


# --- silhouette WITHOUT a pairwise join -------------------------------------

# For squared-Euclidean distance the sum of distances from point i to
# every member of cluster D folds through per-cluster moments:
#   sum_{j in D} ||x_i - x_j||^2 = n_D * ||x_i||^2 - 2 x_i . S_D + SSQ_D
# where S_D is the cluster's per-dim sum vector and SSQ_D its summed
# squared norms.  So silhouette — the standard cluster-quality grade —
# costs O(n * k * d) instead of O(n^2 * d): per point, one row per
# cluster, with the k*(d+2) cluster moments broadcast.  On integer-
# quantized vectors every moment is exact BIGINT (headroom: |q|<=1e6,
# ni<=6.4e13 at d=64, tot<=~1e17 at 1e4-point clusters; wider corpora
# widen the three sums to DECIMAL(38) exactly like embedding_cov), and
# only the final a/b divisions and the (b-a)/max(a,b) fold are pinned
# IEEE doubles — bit-equal across engines.

_SIL_SCALE = 1_000_000

_SIL_SQL = f"""
WITH q AS (
  SELECT vec_id AS v, label, u.i - 1 AS d,
         CAST(FLOOR(CAST(u.x AS DOUBLE) * {_SIL_SCALE}) AS BIGINT) AS qx
  FROM (
    SELECT vec_id, label,
           unnest(list_transform(generate_series(1, len(embedding)),
                                 i -> struct_pack(i := i,
                                                  x := embedding[i]))) AS u
    FROM embeddings)
), pt AS (
  SELECT v, label, CAST(SUM(qx * qx) AS BIGINT) AS ni FROM q GROUP BY 1, 2
), s AS (
  SELECT label AS clabel, d, CAST(SUM(qx) AS BIGINT) AS sd FROM q GROUP BY 1, 2
), cl AS (
  SELECT label AS clabel, CAST(COUNT(*) AS BIGINT) AS n_l,
         CAST(SUM(ni) AS BIGINT) AS ssq_l
  FROM pt GROUP BY 1
), dots AS (
  SELECT q.v, s.clabel, CAST(SUM(q.qx * s.sd) AS BIGINT) AS dot
  FROM q JOIN s USING (d) GROUP BY 1, 2
), per AS (
  SELECT dt.v, p.label, dt.clabel,
         c.n_l * p.ni - 2 * dt.dot + c.ssq_l AS tot, c.n_l
  FROM dots dt JOIN pt p ON p.v = dt.v JOIN cl c ON c.clabel = dt.clabel
), folded AS (
  SELECT v, label,
         COALESCE(MAX(CASE WHEN clabel = label AND n_l > 1
                           THEN CAST(tot AS DOUBLE)
                                / CAST(n_l - 1 AS DOUBLE) END), 0.0) AS a_dist,
         COALESCE(MIN(CASE WHEN clabel <> label
                           THEN CAST(tot AS DOUBLE)
                                / CAST(n_l AS DOUBLE) END), 0.0) AS b_dist,
         CAST(COUNT(CASE WHEN clabel <> label THEN 1 END) AS BIGINT) AS n_other,
         CAST(MAX(CASE WHEN clabel = label THEN n_l END) AS BIGINT) AS n_own
  FROM per GROUP BY 1, 2
)
SELECT v AS vec_id, label, n_own, a_dist, b_dist,
       CASE WHEN n_own = 1 OR n_other = 0
                 OR GREATEST(a_dist, b_dist) = 0 THEN 0.0
            ELSE (b_dist - a_dist) / GREATEST(a_dist, b_dist) END AS silhouette
FROM folded
"""


def cluster_silhouette(emb: DataFrame, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       label_col: str = "label",
                       scale: int = _SIL_SCALE) -> DataFrame:
    """Exact per-point silhouette of an (id, vector, cluster-label)
    frame via the per-cluster-moment identity above.  Returns
    (vec_id, label, n_own, a_dist, b_dist, silhouette); singleton
    clusters get the conventional s=0."""
    q = emb.select(
        F.col(id_col).alias("v"),
        F.col(label_col).alias("label"),
        F.posexplode(vec_col).alias("d", "x"),
    ).select(
        "v", "label", "d",
        F.floor(F.col("x").cast("double") * scale).cast("long").alias("qx"),
    )
    pt = q.groupBy("v", "label").agg(
        F.sum(F.col("qx") * F.col("qx")).cast("long").alias("ni")
    )
    s = q.groupBy(F.col("label").alias("clabel"), "d").agg(
        F.sum("qx").cast("long").alias("sd")
    )
    cl = pt.groupBy(F.col("label").alias("clabel")).agg(
        F.count(F.lit(1)).cast("long").alias("n_l"),
        F.sum("ni").cast("long").alias("ssq_l"),
    )
    dots = (
        q.join(F.broadcast(s), "d")
        .groupBy("v", "clabel")
        .agg(F.sum(F.col("qx") * F.col("sd")).cast("long").alias("dot"))
    )
    per = (
        dots.join(pt, "v")
        .join(F.broadcast(cl), "clabel")
        .select(
            "v", "label", "clabel", "n_l",
            (
                F.col("n_l") * F.col("ni")
                - 2 * F.col("dot")
                + F.col("ssq_l")
            ).alias("tot"),
        )
    )
    own = F.col("clabel") == F.col("label")
    folded = per.groupBy("v", "label").agg(
        F.coalesce(
            F.max(
                F.when(
                    own & (F.col("n_l") > 1),
                    F.col("tot").cast("double")
                    / (F.col("n_l") - 1).cast("double"),
                )
            ),
            F.lit(0.0),
        ).alias("a_dist"),
        F.coalesce(
            F.min(
                F.when(
                    ~own,
                    F.col("tot").cast("double") / F.col("n_l").cast("double"),
                )
            ),
            F.lit(0.0),
        ).alias("b_dist"),
        F.max(F.when(own, F.col("n_l"))).cast("long").alias("n_own"),
        # no other cluster exists (k=1): silhouette is undefined — emit
        # the 0 convention, not (0-a)/a = -1
        F.count(F.when(~own, F.lit(1))).cast("long").alias("n_other"),
    )
    return folded.select(
        F.col("v").alias("vec_id"),
        "label",
        "n_own",
        "a_dist",
        "b_dist",
        F.when(
            (F.col("n_own") == 1)
            | (F.col("n_other") == 0)
            | (F.greatest("a_dist", "b_dist") == 0),
            F.lit(0.0),
        )
        .otherwise(
            (F.col("b_dist") - F.col("a_dist"))
            / F.greatest("a_dist", "b_dist")
        )
        .alias("silhouette"),
    )


@query("cluster_silhouette_exact", _SIL_SQL)
def cluster_silhouette_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-point silhouette of the embeddings table's ground-truth
    label clustering, exact on 1e-6-quantized vectors — the standard
    "are these clusters real" grade for any clustering the pipeline
    produces (kmeans_lloyd_exact, embedding_kmeans_clusters, LPA
    communities), at O(n*k*d) via cluster moments instead of the
    textbook O(n^2) pairwise form."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    return cluster_silhouette(e)
