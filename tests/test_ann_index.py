"""Persistent IVF index: equality with the one-shot path, partition
pruning, appended-vector findability, and bounded file counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.operators.ann_index import (
    append_to_ivf_index,
    build_ivf_index,
    read_ivf_meta,
    search_ivf_index,
)
from fastetl_spark.operators.similarity import QUERY_STRIDE, ivf_topk


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return read_table(spark, sf_dir, "embeddings").cache()


def test_index_search_equals_one_shot_ivf(spark, sf_dir, embeddings, tmp_path_factory):
    """Same corpus, same params: the persisted index's probe-only search
    must return EXACTLY the one-shot ivf_topk frame (the index changes
    where the work happens, never the answer)."""
    idx = str(tmp_path_factory.mktemp("ivf") / "idx")
    build_ivf_index(embeddings, idx, "vec_id", "embedding")
    queries = embeddings.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in search_ivf_index(spark, idx, queries).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(embeddings, queries, "vec_id", "embedding").collect()
    }
    assert got == want and len(got) > 0


def test_index_search_prunes_to_probed_cells(spark, embeddings, tmp_path):
    """The search plan's input files must come ONLY from probed cell
    dirs — and fewer than the index's total files (real pruning, not a
    full scan plus a filter)."""
    idx = str(tmp_path / "idx")
    build_ivf_index(embeddings, idx, "vec_id", "embedding")
    one_query = embeddings.orderBy("vec_id").limit(1)
    res = search_ivf_index(spark, idx, one_query, nprobe=2)
    read_files = [f for f in res.inputFiles() if "cell=" in f]
    assert read_files
    touched_cells = {f.split("cell=")[1].split("/")[0] for f in read_files}
    assert len(touched_cells) <= 2  # nprobe
    all_files = [f for f in spark.read.parquet(idx).inputFiles() if "cell=" in f]
    assert len(read_files) < len(all_files)


@pytest.mark.slow  # full gate only: index search correctness covered by test_index_search_equals_one_shot_ivf / test_ivfpq_index_search_equals_one_shot (default profile); this adds the multi-append file-bound sweep
def test_append_finds_planted_twin_and_bounds_files(spark, embeddings, tmp_path):
    """Append a near-duplicate of an existing vector: the search must
    surface the original as the twin's top neighbor. 20 appends keep
    per-cell file counts bounded by the compaction threshold."""
    idx = str(tmp_path / "idx")
    base = embeddings.filter(F.col("vec_id") < 400)
    build_ivf_index(base, idx, "vec_id", "embedding")
    target = base.orderBy("vec_id").limit(1).collect()[0]
    twin_id = 1_000_000
    twin = spark.createDataFrame(
        [(twin_id, [float(x) * 1.0001 for x in target["embedding"]], "twin")],
        "vec_id long, embedding array<double>, label string",
    )
    append_to_ivf_index(twin.select("vec_id", "embedding"), idx)
    res = search_ivf_index(
        spark, idx, twin.select("vec_id", "embedding"), k=1
    ).collect()
    assert res and res[0].neighbor_id == target["vec_id"]

    # file-count bound under repeated appends (threshold 3 to force it)
    from fastetl_spark.io.fsutil import hadoop_fs

    for i in range(20):
        inc = spark.createDataFrame(
            [(2_000_000 + i, [float(x) for x in target["embedding"]], "x")],
            "vec_id long, embedding array<double>, label string",
        )
        append_to_ivf_index(
            inc.select("vec_id", "embedding"), idx, compact_threshold=3
        )
    fs, path_cls = hadoop_fs(spark, idx)
    target_cell_dirs = [
        s.getPath()
        for s in fs.listStatus(path_cls(idx))
        if s.isDirectory() and s.getPath().getName().startswith("cell=")
    ]
    for d in target_cell_dirs:
        n = sum(
            1
            for s in fs.listStatus(d)
            if s.isFile() and s.getPath().getName().endswith(".parquet")
        )
        assert n <= 4  # threshold 3 + at most one fresh append file

    # index still answers correctly after all the compactions
    res2 = search_ivf_index(
        spark, idx, twin.select("vec_id", "embedding"), k=1
    ).collect()
    assert res2 and res2[0].neighbor_id == target["vec_id"]


def test_incomplete_index_is_rejected(spark, embeddings, tmp_path):
    idx = str(tmp_path / "idx")
    # data written but meta missing = incomplete build
    embeddings.limit(10).select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").alias("vec"),
        F.lit(1.0).alias("norm"),
        F.lit(0).alias("cell"),
    ).write.partitionBy("cell").parquet(idx)
    assert read_ivf_meta(spark, idx) is None
    with pytest.raises(ValueError, match="not a complete IVF index"):
        search_ivf_index(spark, idx, embeddings.limit(1))
    with pytest.raises(ValueError, match="not a complete IVF index"):
        append_to_ivf_index(embeddings.limit(1), idx)


def test_ivfpq_index_search_equals_one_shot(spark, sf_dir, embeddings, tmp_path):
    """Persisted codes+vectors layout + ADC search must return EXACTLY
    the one-shot ivfpq_topk frame for the same corpus/params."""
    from fastetl_spark.operators.ann_index import (
        build_ivfpq_index,
        search_ivfpq_index,
    )
    from fastetl_spark.operators.similarity import ivfpq_topk

    idx = str(tmp_path / "pqidx")
    build_ivfpq_index(embeddings, idx, "vec_id", "embedding")
    queries = embeddings.filter(F.col("vec_id") % QUERY_STRIDE == 0)
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in search_ivfpq_index(spark, idx, queries).collect()
    }
    want = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivfpq_topk(embeddings, queries, "vec_id", "embedding").collect()
    }
    assert got == want and len(got) > 0


def test_ivfpq_append_twin_found_and_incomplete_rejected(spark, embeddings, tmp_path):
    from fastetl_spark.operators.ann_index import (
        append_to_ivfpq_index,
        build_ivfpq_index,
        read_ivfpq_meta,
        search_ivfpq_index,
    )

    idx = str(tmp_path / "pqidx")
    base = embeddings.filter(F.col("vec_id") < 400)
    build_ivfpq_index(base, idx, "vec_id", "embedding")
    target = base.orderBy("vec_id").limit(1).collect()[0]
    twin = spark.createDataFrame(
        [(1_000_000, [float(x) * 1.0001 for x in target["embedding"]])],
        "vec_id long, embedding array<double>",
    )
    append_to_ivfpq_index(twin, idx)
    res = search_ivfpq_index(spark, idx, twin, k=1).collect()
    assert res and res[0].neighbor_id == target["vec_id"]

    bad = str(tmp_path / "bad")
    assert read_ivfpq_meta(spark, bad) is None
    with pytest.raises(ValueError, match="IVF-PQ"):
        search_ivfpq_index(spark, bad, twin)


def test_streaming_ann_ingest_appends_searchable_vectors(spark, embeddings, tmp_path):
    """Embeddings streamed in micro-batches land in the persisted index
    and are immediately searchable: a planted twin streamed through the
    ingest path surfaces its original as top neighbor."""
    from fastetl_spark.operators.ann_index import build_ivf_index, search_ivf_index
    from fastetl_spark.streaming.stream_ops import foreach_batch_ann_ingest

    idx = str(tmp_path / "idx")
    base = embeddings.filter(F.col("vec_id") < 400)
    build_ivf_index(base, idx, "vec_id", "embedding")
    target = base.orderBy("vec_id").limit(1).collect()[0]

    stream_in = str(tmp_path / "in")
    twin = spark.createDataFrame(
        [(1_000_000 + i, [float(x) * (1.0 + 0.0001 * (i + 1)) for x in target["embedding"]])
         for i in range(3)],
        "vec_id long, embedding array<double>",
    )
    twin.repartition(3).write.parquet(stream_in)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_in)
    )
    q = foreach_batch_ann_ingest(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    res = search_ivf_index(
        spark, idx, twin.filter(F.col("vec_id") == 1_000_000), k=1
    ).collect()
    assert res and res[0].neighbor_id == target["vec_id"]
    # all three streamed vectors are present in the index
    got_ids = {
        r.vid
        for r in spark.read.parquet(idx).filter(F.col("vid") >= 1_000_000).collect()
    }
    assert got_ids == {1_000_000, 1_000_001, 1_000_002}

    # un-built index is rejected at wiring time, not first batch
    import pytest as _pytest

    with _pytest.raises(ValueError, match="build_ivf_index"):
        foreach_batch_ann_ingest(stream, str(tmp_path / "nope"), str(tmp_path / "c2"))


def test_search_skips_probed_cells_with_no_dir(spark, embeddings, tmp_path):
    """A tiny corpus leaves most cells empty (no cell= dir on disk);
    probing an empty cell must contribute nothing, not fail the scan."""
    from fastetl_spark.operators.ann_index import build_ivf_index, search_ivf_index

    idx = str(tmp_path / "idx")
    tiny = embeddings.orderBy("vec_id").limit(20)  # 16 cells, most empty
    build_ivf_index(tiny, idx, "vec_id", "embedding")
    queries = embeddings.orderBy("vec_id").limit(5)
    # high nprobe guarantees empty cells are probed
    res = search_ivf_index(spark, idx, queries, k=3, nprobe=16).collect()
    assert len(res) > 0  # no missing-path failure, neighbors still found


def test_semantic_match_agrees_with_one_shot_and_prunes(spark, tmp_path):
    """Persistent semantic matching: fixed centroids make the index's
    decisions comparable with the one-shot semantic_dedup_increment
    (well-separated sims, so double-vs-quantized-integer compare cannot
    flip near the threshold), and the scan must touch only the
    increment's assigned cells."""
    from fastetl_spark.operators.ann_index import match_semantic_index
    from fastetl_spark.operators.curation2 import semantic_dedup_increment

    base = [
        (i, [float((i * 7 + k * 3) % 13 - 6) / 6.0 for k in range(8)]) for i in range(40)
    ]
    corpus = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    inc = spark.createDataFrame(
        [(100, [x + 1e-4 for x in base[5][1]]), (101, [9.0] * 8)],
        "vec_id long, embedding array<float>",
    )
    cents = [[float(x) for x in r.embedding]
             for r in corpus.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    idx = str(tmp_path / "semidx")
    build_ivf_index(corpus, idx, "vec_id", "embedding", centroids=cents)
    assert read_ivf_meta(spark, idx)["n_cells"] == 4

    got = match_semantic_index(spark, idx, inc, threshold=0.99)
    rows = {r.vec_id: r for r in got.collect()}
    assert rows[100].dup_of == 5 and not rows[100].is_new
    assert rows[101].is_new and rows[101].dup_of is None

    ref = {r.vec_id: r for r in semantic_dedup_increment(
        corpus, inc, "vec_id", "embedding", n_centroids=4, threshold_pct=99
    ).collect()}
    assert {v: (r.dup_of, r.is_new) for v, r in rows.items()} == {
        v: (r.dup_of, not r.is_kept if hasattr(r, "is_kept") else r.is_new)
        for v, r in ref.items()
    }

    # pruning: only the increment's assigned cell dirs are scanned
    read_cells = {f.split("cell=")[1].split("/")[0]
                  for f in got.inputFiles() if "cell=" in f}
    probed = {str(r.cell) for r in got.select("cell").collect()}
    assert read_cells <= probed


def test_match_semantic_index_empty_cells_all_new(spark, tmp_path):
    """An increment probing only cells that received no corpus vectors
    comes back all-new instead of failing the scan."""
    from fastetl_spark.operators.ann_index import match_semantic_index

    corpus = spark.createDataFrame(
        [(i, [1.0, float(i % 3)]) for i in range(8)],
        "vec_id long, embedding array<float>",
    )
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    idx = str(tmp_path / "empt")
    build_ivf_index(corpus, idx, "vec_id", "embedding", centroids=cents)
    inc = spark.createDataFrame([(50, [-1.0, 0.1])], "vec_id long, embedding array<float>")
    out = match_semantic_index(spark, idx, inc, threshold=0.5).collect()
    assert len(out) == 1 and out[0].is_new


def test_match_semantic_index_intra_batch_twins(spark, tmp_path):
    """Twins arriving in one batch: the smaller id stays new, the larger
    is flagged against its batch-mate; re-matching after the append
    yields the same is_new set (append replay guard stays effective)."""
    from fastetl_spark.operators.ann_index import (
        append_to_ivf_index,
        match_semantic_index,
    )

    base = [
        (i, [float((i * 7 + k * 3) % 13 - 6) / 6.0 for k in range(8)]) for i in range(40)
    ]
    corpus = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    cents = [[float(x) for x in r.embedding]
             for r in corpus.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    idx = str(tmp_path / "twins")
    build_ivf_index(corpus, idx, "vec_id", "embedding", centroids=cents)
    novel = [x + 3.0 for x in base[7][1]]  # not near any corpus vector
    inc = spark.createDataFrame(
        [(200, novel), (201, novel)], "vec_id long, embedding array<float>"
    )
    first = {r.vec_id: r for r in match_semantic_index(spark, idx, inc, 0.99).collect()}
    assert first[200].is_new and first[200].dup_of is None
    assert not first[201].is_new and first[201].dup_of == 200
    fresh = inc.join(
        spark.createDataFrame([(200,)], "vec_id long"), "vec_id"
    )
    append_to_ivf_index(fresh, idx)
    again = {r.vec_id: r for r in match_semantic_index(spark, idx, inc, 0.99).collect()}
    assert {v: r.is_new for v, r in again.items()} == {200: True, 201: False}
