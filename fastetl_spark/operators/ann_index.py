"""Persistent IVF index: the similarity-side twin of the persistent
dedup indexes (operators/dedup_index).

`similarity_ivf` trains + assigns + searches in one job — right for a
one-shot query, wasteful when the corpus is long-lived and queries
arrive daily. This module materializes the IVF structure once:

- **build**: train the deterministic coarse quantizer (id-ordered
  prefix sample, numpy Lloyd on the driver — similarity.py's
  construction), assign every corpus vector to its nearest cell with
  ONE Arrow-batched matmul pass, and write the corpus partitioned by
  ``cell=K`` Hive dirs. Centroids + params land in ``_ivf_meta.json``,
  committed LAST, so a half-built index is never mistaken for a
  complete one (same contract as the bucketed layout's spec file).
- **search**: probe each query's ``nprobe`` nearest cells, scan ONLY
  those cell partitions (partition pruning on the cell dir — at 100 TB
  a query touches nprobe/n_cells of the corpus), exact-cosine rerank,
  window top-k. Identical candidate set and ranking to
  similarity.ivf_topk with the same corpus/params (equality-tested).
- **append**: assign new vectors with the STORED centroids (the cell
  structure is frozen at build time — standard IVF maintenance; re-run
  build when drift matters) and append into the touched cell dirs,
  auto-compacting any cell whose file count creeps past a threshold —
  O(|increment|) per day, like the dedup index appends.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.fsutil import hadoop_fs, read_text_file, write_text_file
from fastetl_spark.operators.similarity import (
    IVF_K,
    IVF_NPROBE,
    TOP_K,
    _probe_cells_udf,
    as_double,
    dot,
    ivf_train_centroids,
    l2_norm,
)

META_FILE = "_ivf_meta.json"
ANN_MAX_FILES_PER_CELL = 16


def _meta_path(path: str) -> str:
    return f"{path.rstrip('/')}/{META_FILE}"


def read_ivf_meta(spark: SparkSession, path: str) -> dict | None:
    """The index's metadata (centroids, params), or None when `path` is
    not a complete IVF index (meta is committed last by build)."""
    text = read_text_file(spark, _meta_path(path))
    return None if text is None else json.loads(text)


def _assign_cells(df: DataFrame, centroids, id_col: str, vec_col: str) -> DataFrame:
    assign1 = _probe_cells_udf(centroids, 1)
    out = df.select(
        F.col(id_col).alias("vid"), as_double(F.col(vec_col)).alias("vec")
    ).withColumn("norm", l2_norm(F.col("vec")))
    return out.withColumn("cell", F.element_at(assign1("vec"), 1))


def build_ivf_index(
    corpus: DataFrame,
    index_path: str,
    id_col: str,
    vec_col: str,
    n_cells: int = IVF_K,
) -> None:
    """One corpus pass: train quantizer, assign cells, write the corpus
    partitioned by cell, commit meta last."""
    spark = corpus.sparkSession
    centroids = ivf_train_centroids(corpus, vec_col, k=n_cells, id_col=id_col)
    assigned = _assign_cells(corpus, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(index_path)
    write_text_file(
        spark,
        _meta_path(index_path),
        json.dumps(
            {
                "version": 1,
                "n_cells": int(n_cells),
                "id_col": id_col,
                "vec_col": vec_col,
                "centroids": centroids,
            }
        ),
    )


def append_to_ivf_index(
    new_vecs: DataFrame,
    index_path: str,
    compact_threshold: int | None = ANN_MAX_FILES_PER_CELL,
) -> None:
    """O(|increment|) maintenance: assign with the STORED centroids and
    append into the touched cell dirs; touched cells past
    ``compact_threshold`` data files are rewritten with one coalesce +
    atomic swap (None disables)."""
    spark = new_vecs.sparkSession
    meta = read_ivf_meta(spark, index_path)
    if meta is None:
        raise ValueError(f"{index_path} is not a complete IVF index (no {META_FILE})")
    assigned = _assign_cells(
        new_vecs, meta["centroids"], meta["id_col"], meta["vec_col"]
    ).transform(materialize)
    assigned.write.mode("append").partitionBy("cell").parquet(index_path)
    if compact_threshold is None:
        return
    from fastetl_spark.io.writers import compact_parquet_dir

    touched = sorted(r[0] for r in assigned.select("cell").distinct().collect())
    fs, path_cls = hadoop_fs(spark, index_path)
    base = index_path.rstrip("/")
    for cell in touched:
        cell_dir = f"{base}/cell={cell}"
        n_files = sum(
            1
            for s in fs.listStatus(path_cls(cell_dir))
            if s.isFile() and s.getPath().getName().endswith(".parquet")
        )
        if n_files > compact_threshold:
            compact_parquet_dir(spark, cell_dir)


def search_ivf_index(
    spark: SparkSession,
    index_path: str,
    queries: DataFrame,
    k: int = TOP_K,
    nprobe: int = IVF_NPROBE,
) -> DataFrame:
    """Probe-only search: nprobe nearest cells per query, scan ONLY
    those cell partitions, exact-cosine rerank, top-k per query. The
    probed-cell set collected on the driver is bounded by n_cells (a
    handful of ints, not data). Returns (query_id, neighbor_id, rank) —
    the same frame ivf_topk produces."""
    meta = read_ivf_meta(spark, index_path)
    if meta is None:
        raise ValueError(f"{index_path} is not a complete IVF index (no {META_FILE})")
    probe_n = _probe_cells_udf(meta["centroids"], nprobe)
    q = queries.select(
        F.col(meta["id_col"]).alias("query_id"),
        as_double(F.col(meta["vec_col"])).alias("qv"),
    ).withColumn("qn", l2_norm(F.col("qv")))
    q = q.withColumn("probe", F.explode(probe_n("qv"))).transform(materialize)
    probed = sorted(r[0] for r in q.select("probe").distinct().collect())
    cells = (
        spark.read.option("basePath", index_path)
        .parquet(*[f"{index_path.rstrip('/')}/cell={c}" for c in probed])
    )
    scored = cells.join(
        broadcast(q),
        (F.col("cell") == F.col("probe")) & (F.col("vid") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        (dot(F.col("qv"), F.col("vec")) / (F.col("qn") * F.col("norm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


# --- registered form ------------------------------------------------------

from fastetl_spark.io.readers import ensure_parallelism, read_table  # noqa: E402
from fastetl_spark.operators.dedup_index import (  # noqa: E402
    _scratch_index_path,
)
from fastetl_spark.operators.similarity import QUERY_STRIDE  # noqa: E402
from fastetl_spark.registry import query  # noqa: E402


@query("similarity_ivf_index")  # approximate ANN — rows-only check
def similarity_ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persistent-ANN path: IVF index built once in scratch (reused
    when a complete build exists — meta committed last), then probe-only
    search for the stride query set. Equality with the one-shot
    ivf_topk (same corpus/params) is asserted in tests; pruning is
    proven from the scan's input files."""
    e = ensure_parallelism(read_table(spark, sf_dir, "embeddings"))
    idx = _scratch_index_path(sf_dir, "ivf_idx")
    if read_ivf_meta(spark, idx) is None:
        build_ivf_index(e, idx, "vec_id", "embedding")
    return search_ivf_index(
        spark, idx, e.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    )
