"""ANN search-quality evaluation under the exact gate.

``ann_recall_at_k`` measures what every production ANN deployment has
to monitor — recall@k of the pruned (IVF, nprobe=1) search against
brute-force ground truth — and does it BIT-EXACTLY: with fixed literal
centroids (no Lloyd training) and integer-quantized vectors, both the
cell assignment and the similarity ranking reduce to exact integer
dot products pushed through ONE cast-divide-sqrt IEEE shape that DuckDB
reproduces bit-for-bit (the semantic_dedup determinism recipe,
curation2.py). So the recall measurement itself — not just the search —
sits under the exact DuckDB hash gate: approximate-by-design quality,
exactly measured.

Scale shape: ground truth is only ever computed for the bounded probe
set (|Q| = corpus/stride), broadcast against the corpus — the standard
offline-eval harness; the IVF side reuses the same single-shuffle
cell-equi-join as the search path. At 100 TB you run this on a sampled
probe set against the persistent index (ann_index.search_ivf_index) —
the metric definition and tie-breaking here are the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.operators.curation2 import (
    _centroid_vecs,
    _quantized_centroid_lit,
    _SD_SCALE,
    idot,
    quantized,
)
from fastetl_spark.operators.similarity import QUERY_STRIDE, TOP_K, as_double
from fastetl_spark.registry import query

_RK_CENTROIDS = 16


def _sim_key(qv_col: F.Column, cv_col: F.Column, nn_col: F.Column) -> F.Column:
    """Ranking key monotone in cosine for a FIXED query: dot/|c| (the
    query norm is constant per partition). Exact-integer dot cast to
    double through one divide + one sqrt — bit-identical in DuckDB."""
    return idot(qv_col, cv_col).cast("double") / F.sqrt(nn_col.cast("double"))


@query(
    "ann_recall_at_k",
    f"""
WITH v AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(floor(x * {_SD_SCALE}) AS BIGINT)) AS qv
  FROM embeddings
), vv AS (
  SELECT vec_id, qv,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nn
  FROM v
), cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS i, qv AS cv,
         CAST(list_dot_product(qv::DOUBLE[], qv::DOUBLE[]) AS BIGINT) AS nc
  FROM v WHERE vec_id < {_RK_CENTROIDS}
), sims AS (
  SELECT vv.vec_id, c.i,
         CASE WHEN c.nc > 0 THEN
           CAST(list_dot_product(vv.qv::DOUBLE[], c.cv::DOUBLE[]) AS DOUBLE)
             / sqrt(CAST(c.nc AS DOUBLE)) END AS key
  FROM vv CROSS JOIN cents c
), assign AS (
  SELECT vec_id, i AS cell FROM (
    SELECT vec_id, i,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY key DESC NULLS LAST, i) AS rn
    FROM sims
  ) WHERE rn = 1
), pts AS (
  SELECT vv.vec_id, vv.qv, vv.nn, a.cell
  FROM vv JOIN assign a USING (vec_id)
), q AS (
  SELECT * FROM pts WHERE vec_id % {QUERY_STRIDE} = 0
), c AS (
  SELECT * FROM pts WHERE nn > 0
), brute_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY CAST(list_dot_product(q.qv::DOUBLE[], c.qv::DOUBLE[])
                           AS DOUBLE) / sqrt(CAST(c.nn AS DOUBLE)) DESC,
                      c.vec_id) AS rn
    FROM q CROSS JOIN c WHERE c.vec_id <> q.vec_id
  ) WHERE rn <= {TOP_K}
), ivf_cand AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST(list_dot_product(q.qv::DOUBLE[], c.qv::DOUBLE[]) AS DOUBLE)
           / sqrt(CAST(c.nn AS DOUBLE)) AS key
  FROM q JOIN c ON c.cell = q.cell AND c.vec_id <> q.vec_id
), ivf_top AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY key DESC, neighbor_id) AS rn
    FROM ivf_cand
  ) WHERE rn <= {TOP_K}
), n_cands AS (
  SELECT query_id, COUNT(*) AS n FROM ivf_cand GROUP BY query_id
), n_hits AS (
  SELECT b.query_id, COUNT(*) AS n
  FROM brute_top b JOIN ivf_top i USING (query_id, neighbor_id)
  GROUP BY b.query_id
)
SELECT q.vec_id AS query_id, CAST(q.cell AS INT) AS cell,
       CAST(COALESCE(nc.n, 0) AS BIGINT) AS n_cands,
       CAST(COALESCE(nh.n, 0) AS BIGINT) AS n_hit
FROM q
LEFT JOIN n_cands nc ON nc.query_id = q.vec_id
LEFT JOIN n_hits nh ON nh.query_id = q.vec_id
""",
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@{TOP_K} of single-probe IVF search against
    brute-force cosine ground truth, with the first {_RK_CENTROIDS}
    embeddings as fixed centroids. Output: (query_id, assigned cell,
    probed-candidate count, hits among the exact top-{TOP_K}) — all
    integers, bit-deterministic.
    """
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    qv = e.select(
        "vec_id", quantized(as_double(F.col("embedding"))).alias("qv")
    )
    cent_lit = _quantized_centroid_lit(
        _centroid_vecs(qv, _RK_CENTROIDS, None, "ann_recall_at_k")
    )
    scored = F.transform(
        cent_lit,
        lambda cc: F.struct(
            F.when(
                cc["nc"] > 0,
                idot(F.col("qv"), cc["cv"]).cast("double")
                / F.sqrt(cc["nc"].cast("double")),
            ).alias("key"),
            (-cc["i"]).alias("negi"),
        ),
    )
    pts = qv.select(
        "vec_id",
        "qv",
        (-F.array_max(scored)["negi"]).cast("int").alias("cell"),
        idot(F.col("qv"), F.col("qv")).alias("nn"),
    ).transform(materialize)

    q = pts.filter(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("qv").alias("qqv"),
        F.col("cell").alias("qcell"),
    )
    c = pts.filter(F.col("nn") > 0).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("qv").alias("cqv"),
        F.col("cell").alias("ccell"),
        "nn",
    )
    key = _sim_key(F.col("qqv"), F.col("cqv"), F.col("nn"))

    brute = (
        c.join(broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("key", key)
    )
    wb = Window.partitionBy("query_id").orderBy(F.desc("key"), F.asc("neighbor_id"))
    brute_top = (
        brute.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )

    ivf_cand = (
        c.join(
            broadcast(q),
            (F.col("ccell") == F.col("qcell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("key", key)
        .select("query_id", "neighbor_id", "key")
    )
    ivf_top = (
        ivf_cand.withColumn("rn", F.row_number().over(wb))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "neighbor_id")
    )

    n_cands = ivf_cand.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_cands"))
    # every frame below is probe-set-sized (<= |Q|*k rows) — broadcast
    # the assembly joins so no sort-merge exchange survives in the plan
    n_hits = (
        brute_top.join(broadcast(ivf_top), ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        q.select("query_id", F.col("qcell").alias("cell"))
        .join(broadcast(n_cands), "query_id", "left")
        .join(broadcast(n_hits), "query_id", "left")
        .select(
            "query_id",
            "cell",
            F.coalesce(F.col("n_cands"), F.lit(0).cast("long")).alias("n_cands"),
            F.coalesce(F.col("n_hit"), F.lit(0).cast("long")).alias("n_hit"),
        )
    )
