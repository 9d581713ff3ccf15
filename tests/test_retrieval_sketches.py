"""Behavioral tests for the round-6 retrieval/sketch additions — the
properties the oracle hash-compare can't state directly:

- containment finds the short-doc-swallowed-by-long-doc case that
  Jaccard structurally misses (the reason the operator exists);
- BM25 ranks a term-dense short doc above a diluted long one and
  downweights common terms via idf;
- the dense-vector simhash is locality-sensitive: identical vectors
  collide exactly, a small perturbation moves few bits, an unrelated
  vector moves many.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from fastetl_spark.operators.dedup import containment_pairs, ngram_jaccard_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_containment_catches_subdocument_dup(spark):
    short = "alpha beta gamma delta epsilon zeta eta theta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(80))
    d = _docs(spark, [(1, short), (2, filler + " " + short + " " + filler)])
    cont = containment_pairs(d, df_cap=None).collect()
    directed = {(r["src"], r["dst"]): r["containment"] for r in cont}
    # every shingle of doc 1 occurs in doc 2
    assert directed.get((1, 2)) == 1.0
    # the reverse direction is nowhere near threshold
    assert (2, 1) not in directed
    # and Jaccard misses the pair entirely at its default threshold
    jac = ngram_jaccard_pairs(d, df_cap=None).collect()
    assert jac == []


def test_bm25_ranking_properties(spark):
    from fastetl_spark.operators.retrieval import bm25_topk

    rows = [
        (1, "rare rare filler1 filler2 filler3"),
        (2, "rare " + " ".join(f"pad{i}" for i in range(60))),
        (3, "common plain text here"),
        (4, "common other words entirely"),
        (5, "justwords nothing special at all"),
        (6, "more neutral words here too"),
    ]
    top = bm25_topk(_docs(spark, rows), terms=("rare", "common"), k=6).collect()
    ranked = [r["doc_id"] for r in top]
    scores = {r["doc_id"]: r["score"] for r in top}
    # term-dense short doc beats the same term diluted in a long doc
    assert ranked[0] == 1, ranked
    assert scores[1] > scores[2]
    # docs hitting no query term score exactly 0 and sort last
    assert scores[5] == 0.0 and scores[6] == 0.0
    assert set(ranked[-2:]) == {5, 6}
    # every term-hitting doc outranks the no-hit docs (positive idf here)
    assert min(scores[1], scores[2], scores[3], scores[4]) > 0.0


def test_embedding_simhash_locality(spark):
    import fastetl_spark.operators.vector_sketch as vs

    dim = vs._VS_DIM
    base = [((i * 37) % 100) / 100.0 - 0.5 for i in range(dim)]
    near = list(base)
    near[0] += 0.001  # tiny perturbation
    far = [-x for x in base]  # opposite direction: all bits flip
    rows = [(0, base, 0), (1, list(base), 0), (2, near, 0), (3, far, 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    # drive the signature core directly on a synthetic frame (patch the
    # name bound inside the module, not the readers module)
    orig = vs.read_table
    try:
        vs.read_table = lambda spark_, sf_dir_, name_: df
        sigs = {r["vec_id"]: r["simhash"] for r in vs._signatures(spark, "unused").collect()}
    finally:
        vs.read_table = orig
    assert sigs[0] == sigs[1]  # identical vectors: identical sketch
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[0], sigs[2]) <= 4  # near vector: few bits move
    assert ham(sigs[0], sigs[3]) == 32  # antipodal vector: every bit flips


def test_prefix_filter_reduces_candidates(spark, sf_dir):
    """The efficiency claim of dedup_jaccard_prefix, measured: the
    prefix index explodes fewer rows and yields strictly fewer
    candidate pairs than the full inverted index, while the gated query
    (shared complete oracle) proves no true pair is lost."""
    import pyspark.sql.functions as F

    from fastetl_spark.io.readers import read_table
    from fastetl_spark.operators.dedup import (
        prefix_filtered_candidates,
        shingle_hashes,
        word_tokens,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix_cands = prefix_filtered_candidates(d).count()

    sh = d.select(
        "doc_id", shingle_hashes(word_tokens(F.col("text"))).alias("shingles")
    )
    ex = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    full_cands = (
        ex.groupBy("shingle")
        .agg(F.collect_set("doc_id").alias("docs"))
        .filter(F.size("docs") >= 2)
        .select(F.explode("docs").alias("a"), F.col("docs"))
        .select("a", F.explode("docs").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .distinct()
        .count()
    )
    assert 0 < prefix_cands < full_cands, (prefix_cands, full_cands)


def test_bm25_query_join_matches_fixed_term_scoring(spark):
    """The inverted-index join path must score exactly like the
    per-term-column path for the same single-term query set (same
    formula, same fixed-point floor applied once per term), and handle
    multi-term and df=0-term queries correctly."""
    from fastetl_spark.operators.retrieval import _QJ_FP, bm25_query_scores

    rows = [
        (1, "rare rare filler1 filler2 filler3"),
        (2, "rare " + " ".join(f"pad{i}" for i in range(60))),
        (3, "common plain text here"),
        (4, "common other words entirely"),
        (5, "justwords nothing special at all"),
    ]
    docs = _docs(spark, rows)
    queries = spark.createDataFrame(
        [
            (1, ["rare"]),
            (2, ["common"]),
            (3, ["rare", "common"]),
            (4, ["rare", "zz_no_such_term"]),
        ],
        "query_id int, terms array<string>",
    )
    out = bm25_query_scores(docs, queries, k=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r

    # single-term queries: only term-hitting docs appear (no-hit docs
    # don't join — the tf=0 zero-contribution of the formula)
    assert set(by_q[1]) == {1, 2}
    assert set(by_q[2]) == {3, 4}
    # term-dense short doc ranks first for its term
    assert by_q[1][1]["rank"] == 1

    # multi-term query = fixed-point sum of the single-term scores
    for doc in (1, 2, 3, 4):
        expected = by_q[1].get(doc, None) or by_q[2].get(doc)
        assert by_q[3][doc]["score_fp"] == expected["score_fp"]
    assert by_q[3][1]["n_terms_hit"] == 1

    # a df=0 term contributes nothing: query 4 == query 1 scores
    assert {d: r["score_fp"] for d, r in by_q[4].items()} == {
        d: r["score_fp"] for d, r in by_q[1].items()
    }

    # score is the pinned fixed-point division
    for r in out:
        assert r["score"] == r["score_fp"] / _QJ_FP


def test_bm25_query_join_plan_is_index_shaped(spark):
    """The candidate set must come from the posting-list join — the plan
    must not contain a corpus-sized cartesian product (queries x docs
    appears only as the broadcast stats row)."""
    from fastetl_spark.operators.retrieval import bm25_query_scores

    docs = _docs(spark, [(i, f"w{i % 5} common t{i}") for i in range(40)])
    queries = spark.createDataFrame(
        [(1, ["common", "w1"])], "query_id int, terms array<string>"
    )
    df = bm25_query_scores(docs, queries)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan


def test_jl_projection_preserves_distances(spark):
    """The +-1 JL projection must roughly preserve pairwise L2 geometry:
    after the 1/sqrt(K) scaling, squared distances in the projected
    space should sit within a broad distortion band of the originals
    (K=16 => typical relative error ~1/sqrt(16); we assert the median
    stays under 50% and no systematic collapse/blow-up)."""
    import math
    import random

    from fastetl_spark.operators.vector_sketch import _JL_K, jl_project

    rng = random.Random(7)
    dim = 64
    vecs = [(i, [rng.gauss(0, 1) for _ in range(dim)]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    proj = {}
    for r in jl_project(df).collect():
        proj.setdefault(r["vec_id"], {})[r["k"]] = r["comp"]
    # quantized originals (what the operator actually projects)
    q = {
        i: [math.floor(float(x) * 1e6) for x in r["embedding"]]
        for i, r in ((row["vec_id"], row) for row in df.collect())
    }
    dist = []
    ids = sorted(proj)
    for a in ids[:20]:
        for b in ids[20:]:
            d_orig = sum((xa - xb) ** 2 for xa, xb in zip(q[a], q[b]))
            d_proj = sum(
                (proj[a][k] - proj[b][k]) ** 2 for k in range(_JL_K)
            ) / _JL_K
            dist.append(d_proj / d_orig)
    dist.sort()
    med = dist[len(dist) // 2]
    assert 0.5 < med < 2.0, med
    assert dist[int(len(dist) * 0.9)] < 3.0, dist[-5:]


def test_sq8_codes_range_and_reconstruction(spark):
    """SQ8 codes stay in 0..255, extremes map to the ends, constant
    dims code to 0, and dequantization error is bounded by
    range/255 + one quantization ulp per dim."""
    from fastetl_spark.operators.vector_sketch import _SQ8_SCALE, sq8_codes

    rows = [
        (i, [float(i) / 7.0, -3.0 + 0.01 * ((i * 13) % 97), 5.0])
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = sq8_codes(df).collect()
    by_vec = {(r["vec_id"], r["dim"]): r for r in out}
    assert all(0 <= r["code"] <= 255 for r in out)
    # constant dim 2 -> min_q == max_q -> code 0 everywhere
    assert all(by_vec[(i, 2)]["code"] == 0 for i in range(50))
    # per-dim extremes map to the code range ends
    for d in (0, 1):
        dim_rows = [r for r in out if r["dim"] == d]
        lo = min(dim_rows, key=lambda r: (r["min_q"], r["code"]))
        assert min(r["code"] for r in dim_rows) == 0
        assert max(r["code"] for r in dim_rows) == 255
        rng = dim_rows[0]["max_q"] - dim_rows[0]["min_q"]
        for r in dim_rows:
            deq = (
                r["min_q"] + r["code"] * rng / 255.0
            ) / _SQ8_SCALE
            orig = float(rows[r["vec_id"]][1][d])
            assert abs(deq - orig) <= rng / 255.0 / _SQ8_SCALE + 1.0 / _SQ8_SCALE, (
                r, deq, orig
            )


def test_rrf_fuse_semantics(spark):
    """RRF fusion: two-sided docs beat any one-sided doc (range
    disjointness for ranks <= K/6), absent systems contribute exactly
    0, ties break by doc_id, and the score is the literal two-term
    rational of the integer ranks."""
    from fastetl_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)],
        "query_id long, doc_id long, rank long",
    )
    rows = {r["doc_id"]: r for r in rrf_fuse(a, b).collect()}
    assert rows[11]["in_a"] and rows[11]["in_b"]
    assert rows[11]["fused_rank"] == 1  # only two-sided doc wins
    assert rows[11]["rrf_score"] == 1.0 / 62 + 1.0 / 61
    assert rows[10]["rrf_score"] == 1.0 / 61 + 0.0
    assert rows[13]["rrf_score"] == 0.0 + 1.0 / 62
    # 10 (rank 1 in a) beats 13 (rank 2 in b); 12 (rank 3) last
    order = sorted(rows.values(), key=lambda r: r["fused_rank"])
    assert [r["doc_id"] for r in order] == [11, 10, 13, 12]
    # exact tie (same rank in disjoint systems) -> doc_id order
    t = rrf_fuse(
        spark.createDataFrame([(1, 21, 1)], "query_id long, doc_id long, rank long"),
        spark.createDataFrame([(1, 20, 1)], "query_id long, doc_id long, rank long"),
    ).collect()
    tr = {r["doc_id"]: r["fused_rank"] for r in t}
    assert tr == {20: 1, 21: 2}


def test_bm25_machine_workload_and_max_df(spark):
    """Machine-sized query sets (PERF.md #39): without the broadcast
    hint the plan keeps keyed equi-joins (the only nested loop is the
    1-row corpus-stats broadcast), and max_df prunes stopword-grade
    terms' corpus-sized posting slices while retained terms score
    BIT-identically (stats are computed before the cap)."""
    import pyspark.sql.functions as F

    from fastetl_spark.operators.retrieval import (
        bm25_from_posting,
        doc_posting,
    )

    # Zipfian toy corpus: 'the' is in every doc (df = n), tail terms in
    # ~2% of docs. Queries mix one head term with tail terms.
    n = 200
    docs = spark.createDataFrame(
        [
            (
                i,
                "the alpha" + str(i % 50) + " beta" + str(i % 37) + " the",
            )
            for i in range(n)
        ],
        "doc_id long, text string",
    )
    queries = spark.createDataFrame(
        [
            (qid, ["the", f"alpha{qid % 50}", f"beta{qid % 37}"])
            for qid in range(100)
        ],
        "query_id long, terms array<string>",
    )
    posting = doc_posting(docs)
    exact = bm25_from_posting(
        posting, queries, k=5, broadcast_queries=False
    )
    plan = exact._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the single nested loop is the documented 1-row stats crossJoin
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan)

    # candidate volume (top-k disabled via huge k): the head term drags
    # every doc into every exact query; the cap keeps only the tail
    # terms' small slices
    n_exact = bm25_from_posting(
        posting, queries, k=10**6, broadcast_queries=False
    ).count()
    # default path: the broadcast hint must survive onto the
    # corpus-sized posting join (a hint on qt alone is consumed by the
    # qt-dft join) — posting must never plan as a shuffle join
    hinted_plan = (
        bm25_from_posting(posting, queries, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortMergeJoin" not in hinted_plan
    assert "ShuffledHashJoin" not in hinted_plan

    n_capped = bm25_from_posting(
        posting, queries, k=10**6, broadcast_queries=False, max_df=0.5
    ).count()
    assert 0 < n_capped < n_exact / 10
    assert n_exact >= 100 * n  # ~every doc per query via the head term
    # a tail-only query scores identically under the cap: rebuild one
    # query without the head term and compare rows bit-for-bit
    tail_q = spark.createDataFrame(
        [(7, ["alpha7", "beta7"])], "query_id long, terms array<string>"
    )
    t_exact = sorted(map(tuple, bm25_from_posting(
        posting, tail_q, k=5, broadcast_queries=False).collect()))
    t_capped = sorted(map(tuple, bm25_from_posting(
        posting, tail_q, k=5, broadcast_queries=False, max_df=0.5
    ).collect()))
    assert t_exact == t_capped


def test_retrieval_eval_handcrafted_metrics(spark):
    """retrieval_eval on a hand-built ranking with known answers:
    MRR/P/R from first principles, nDCG against a float recomputation
    (the quantized integer weights agree to ~1e-15), and the
    zero-relevant / zero-hit / missing-query conventions."""
    import math

    from fastetl_spark.operators.retrieval import retrieval_eval

    ranked = spark.createDataFrame(
        [(1, d, r) for r, d in enumerate([10, 11, 12, 13, 14], 1)]
        + [(2, d, r) for r, d in enumerate([20, 21, 22], 1)]
        + [(3, d, r) for r, d in enumerate([30, 31], 1)],
        "query_id int, doc_id long, rank long",
    )
    qrels = spark.createDataFrame(
        # q1: relevant at ranks 2 and 4, plus 2 unretrieved -> 4 total
        [(1, 11), (1, 13), (1, 90), (1, 91),
         # q2: single relevant at rank 1
         (2, 20),
         # q4 (not ranked at all): must still report a row of zeros
         (4, 40)],
        "query_id int, doc_id long",
    )
    qids = spark.createDataFrame([(1,), (2,), (3,), (4,)], "query_id int")
    got = {r["query_id"]: r for r in
           retrieval_eval(ranked, qrels, qids, k=10).collect()}
    assert set(got) == {1, 2, 3, 4}
    r1 = got[1]
    assert (r1["n_relevant"], r1["hits_at_k"]) == (4, 2)
    assert r1["mrr_at_k"] == 0.5
    assert r1["precision_at_k"] == 0.2
    assert r1["recall_at_k"] == 0.5
    dcg = 1 / math.log2(3) + 1 / math.log2(5)
    idcg = sum(1 / math.log2(r + 1) for r in (1, 2, 3, 4))
    assert abs(r1["ndcg_at_k"] - dcg / idcg) < 1e-12
    r2 = got[2]
    assert r2["mrr_at_k"] == 1.0 and r2["ndcg_at_k"] == 1.0
    assert r2["recall_at_k"] == 1.0 and r2["precision_at_k"] == 0.1
    assert tuple(got[3])[1:] == (0, 0, 0.0, 0.0, 0.0, 0.0)  # no qrels
    assert tuple(got[4])[1:] == (1, 0, 0.0, 0.0, 0.0, 0.0)  # no ranking
    import pytest as _pytest

    with _pytest.raises(ValueError):
        retrieval_eval(ranked, qrels, qids, k=99)


def test_embedding_cov_gram_twin_equals_relational(spark, sf_dir):
    """embedding_cov_pandas (per-partition integer Gram accumulation,
    d*(d+1)/2 partial rows per BATCH instead of per VECTOR — the
    100 TB path) is bit-identical to the gated relational expansion,
    across a partitioning that splits batches unevenly, and both
    report the full upper triangle."""
    from fastetl_spark.io.readers import read_table as _rt
    from fastetl_spark.operators.vector_sketch import (
        embedding_cov,
        embedding_cov_pandas,
    )

    e = _rt(spark, sf_dir, "embeddings").limit(200).repartition(7)
    rel = sorted(map(tuple, embedding_cov(e).collect()))
    gram = sorted(map(tuple, embedding_cov_pandas(e).collect()))
    assert rel == gram
    d = 64
    assert len(rel) == d * (d + 1) // 2
    # diagonal corr is 1 up to the sqrt(x)*sqrt(x) != x ulp for any
    # non-constant dim
    diag = [r for r in rel if r[0] == r[1]]
    assert diag and all(
        abs(r[4] - 1.0) < 1e-12 for r in diag if r[3] > 0
    )
