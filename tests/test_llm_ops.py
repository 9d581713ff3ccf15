"""Behavioral tests for the LLM-data operators beyond the oracle gate:
LSH recall vs brute force, multimodal plumbing shape, minhash banding
guarantees, near-dup planted-pair detection.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
    shingle_hashes,
    simhash64,
    word_tokens,
)
from fastetl_spark.operators.multimodal import fake_image_features, to_media_table
from fastetl_spark.operators.similarity import cosine_topk


def test_lsh_bucketed_recall_vs_bruteforce(spark, sf_dir):
    """The hyperplane-bucketed ANN must recover a reasonable share of the
    true top-5 within its own bucket (sanity floor, not a guarantee)."""
    from fastetl_spark.operators.similarity import (
        embedding_cosine_topk,
        similarity_lsh_bucketed,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_cosine_topk(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in similarity_lsh_bucketed(spark, sf_dir).collect()
    }
    assert approx, "bucketed ANN returned nothing"
    # every approx neighbor is a real vector pair, never self
    assert all(q != n for q, n in approx)


def test_ann_topk_size_gate(spark, sf_dir):
    """Under the gate ann_topk IS brute force (exact); above it the plan
    must contain no cross join — the LSH bucket equi-join replaces it."""
    from fastetl_spark.operators.similarity import ann_topk, cosine_topk

    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 50 == 0)

    exact = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk(e, q, "vec_id", "embedding").collect()
    }
    gated = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ann_topk(e, q, "vec_id", "embedding").select(
            "query_id", "neighbor_id", "rank"
        ).collect()
    }
    assert gated == exact  # corpus under the gate -> identical to brute force

    big = ann_topk(e, q, "vec_id", "embedding", max_bruteforce_rows=0)
    plan = big._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert big.count() > 0  # bucketed path produces neighbors


def test_ivf_topk_recall_and_no_crossjoin(spark, sf_dir):
    """IVF (k-means cells + nprobe search) must hit a recall floor vs
    brute force and keep the cross join out of the plan — cell equi-join
    only. Pipeline is deterministic (id-ordered seeds, no RNG) so the
    floor is stable."""
    from fastetl_spark.operators.similarity import (
        embedding_cosine_topk,
        similarity_ivf,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_cosine_topk(spark, sf_dir).collect()
    }
    ivf_df = similarity_ivf(spark, sf_dir)
    approx = {(r.query_id, r.neighbor_id) for r in ivf_df.collect()}
    assert all(q != n for q, n in approx)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4  # nprobe/k = 3/16 of the corpus scanned
    plan = ivf_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_cosine_topk_self_excluded_and_ranked(spark, sf_dir):
    e = read_table(spark, sf_dir, "embeddings")
    out = cosine_topk(e, e.limit(3), "vec_id", "embedding", k=4).collect()
    by_q: dict = {}
    for r in out:
        assert r.neighbor_id != r.query_id
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4]


def test_minhash_identical_docs_same_signature(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog today"),
         (2, "the quick brown fox jumps over the lazy dog today"),
         (3, "completely different words appear in this other document here")],
        "doc_id long, text string",
    )
    tok = df.select("doc_id", word_tokens(F.col("text")).alias("tokens"))
    sh = tok.select("doc_id", shingle_hashes(F.col("tokens")).alias("shingles"))
    sigs = sh.select("doc_id", minhash_signature(F.col("shingles")).alias("sig"))
    rows = {r.doc_id: tuple(r.sig) for r in sigs.collect()}
    assert rows[1] == rows[2]
    assert rows[1] != rows[3]
    cands = lsh_candidate_pairs(sigs, "doc_id", "sig")
    pairs = {(r.id_a, r.id_b) for r in cands.collect()}
    assert (1, 2) in pairs


def test_simhash_similar_docs_close(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta iota"),  # 1 token differs
         (3, "one two three four five six seven eight")],
        "doc_id long, text string",
    )
    tok = df.select("doc_id", F.array_distinct(word_tokens(F.col("text"))).alias("t"))
    sims = {r.doc_id: r.s for r in tok.select("doc_id", simhash64(F.col("t")).alias("s")).collect()}
    ham = lambda a, b: bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(sims[1], sims[2]) < ham(sims[1], sims[3])


def test_multimodal_media_table_and_features(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").limit(50)
    media = to_media_table(
        d.withColumn("payload", F.encode("text", "UTF-8")), "doc_id", "payload", "image/fake"
    )
    row = media.first()
    assert row.media_type == "image/fake"
    assert row.byte_size > 0 and len(row.checksum) == 32
    feats = fake_image_features(media, feat_dim=8)
    out = feats.collect()
    assert len(out) == 50
    for r in out[:5]:
        assert 1 <= r.width <= 640 and 1 <= r.height <= 480
        assert len(r.feature) == 8


def test_decode_image_is_stubbed():
    from fastetl_spark.operators.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_payload_byte_profile_jvm_equals_pandas(spark, sf_dir):
    """The gated JVM byte-profile and the Arrow/numpy scale twin (one
    bincount per payload, bytes never become rows) are bit-identical —
    same integers, same single division — and detection reads real
    magic bytes, including deliberately corrupt/unknown payloads."""
    from fastetl_spark.operators.multimodal import (
        _stamped_payload,
        payload_byte_profile,
        payload_byte_profile_pandas,
    )

    d = read_table(spark, sf_dir, "documents").limit(60)
    media = d.withColumn("payload", _stamped_payload()).select(
        "doc_id", "payload"
    )
    jvm = sorted(map(tuple, payload_byte_profile(media).collect()))
    arrow = sorted(map(tuple, payload_byte_profile_pandas(media).collect()))
    assert jvm == arrow
    fmts = {fmt for _, fmt, *_ in jvm}
    assert fmts == {"image/png", "image/jpeg", "image/gif", "audio/wav"}
    # unknown/corrupt payloads: truncated magic falls back to
    # octet-stream; single-byte payload exercises the histogram edges;
    # NULL and empty payloads are dropped by BOTH twins (not crashed,
    # not fabricated into phantom rows)
    odd = spark.createDataFrame(
        [(1, bytes([0x89, 0x50])), (2, b"\x00"), (3, b"RIFFxxxxAVI "),
         (4, b""), (5, None)],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r for r in payload_byte_profile(odd).collect()}
    assert sorted(got) == [1, 2, 3]
    assert all(
        got[i]["format"] == "application/octet-stream" for i in (1, 2, 3)
    )
    assert got[2]["n_bytes"] == 1 and got[2]["distinct_bytes"] == 1
    assert got[2]["top_byte"] == 0 and got[2]["byte_collision_prob"] == 1.0
    assert sorted(map(tuple, payload_byte_profile_pandas(odd).collect())) == \
        sorted(map(tuple, got.values()))


def test_http_enrich_idempotent_and_rate_limited(spark):
    import pandas as pd

    from fastetl_spark.operators.enrich import fake_route_distance, http_enrich

    calls = []

    def counting_fetch(inputs: pd.DataFrame) -> pd.Series:
        calls.append(len(inputs))
        return fake_route_distance(inputs)

    df = spark.createDataFrame(
        [
            (1, -15.79, -47.88, -15.80, -47.90, None),
            (2, -23.55, -46.63, -22.90, -43.20, None),
            (3, None, -46.63, -22.90, -43.20, None),   # missing input -> skipped
            (4, -1.0, -1.0, -2.0, -2.0, 99.9),          # already enriched -> skipped
        ],
        "id long, lat1 double, lon1 double, lat2 double, lon2 double, dist_km double",
    ).coalesce(1)
    out = http_enrich(
        df,
        ["lat1", "lon1", "lat2", "lon2"],
        "dist_km",
        counting_fetch,
        batch_size=10,
    )
    rows = {r.id: r.dist_km for r in out.collect()}
    assert rows[1] is not None and rows[1] > 0
    assert rows[2] is not None and rows[2] > rows[1]  # SP-Rio >> Brasilia block
    assert rows[3] is None       # left un-enriched
    assert rows[4] == 99.9       # untouched


def test_http_enrich_rangeindex_fetch_assigns_positionally(spark):
    """A fetch that builds its result with a fresh RangeIndex (typical
    when wrapping HTTP response lists in pd.Series) must still land on
    the right rows — label-aligned .loc assignment would write NaN."""
    import pandas as pd

    from fastetl_spark.operators.enrich import http_enrich

    def rangeindex_fetch(inputs: pd.DataFrame) -> pd.Series:
        return pd.Series([float(v) * 2 for v in inputs["x"]])  # RangeIndex 0..n-1

    df = spark.createDataFrame(
        [(1, 10.0, None), (2, None, None), (3, 30.0, None), (4, 40.0, 5.0)],
        "id long, x double, y double",
    ).coalesce(1)
    out = http_enrich(df, ["x"], "y", rangeindex_fetch, batch_size=10)
    rows = {r.id: r.y for r in out.collect()}
    assert rows[1] == 20.0 and rows[3] == 60.0
    assert rows[2] is None  # missing input -> skipped
    assert rows[4] == 5.0   # already enriched -> untouched


def test_group_zscore_pandas_agrees_with_native(spark, sf_dir):
    from fastetl_spark.operators.multimodal import group_zscore_pandas

    got = {r.event_id: r.value_zscore for r in group_zscore_pandas(spark, sf_dir).collect()}
    from pyspark.sql.window import Window

    e = __import__("fastetl_spark.io.readers", fromlist=["read_table"]).read_table(
        spark, sf_dir, "events"
    )
    w = Window.partitionBy("user_id")
    native = e.select(
        "event_id",
        ((F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)).alias("z"),
    )
    exp = {r.event_id: r.z for r in native.collect()}
    assert set(got) == set(exp)
    for k in got:
        assert abs(got[k] - (exp[k] or 0.0)) < 1e-9


def test_ngram_jaccard_df_cap_defuses_hot_shingle(spark):
    """One stopword-like shingle shared by hundreds of otherwise-distinct
    docs must NOT produce a quadratic pair bucket: the df-cap drops the
    hot bucket (observably — dropped_buckets metric) and the true
    near-dup pair still survives via its uncommon shingles."""
    import random

    from pyspark.sql import Observation

    from fastetl_spark.operators.dedup import ngram_jaccard_pairs

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(500)]
    hot = "the quick fox"  # one shared 3-shingle across every doc
    rows = []
    for i in range(1, 301):
        body = " ".join(rng.choice(vocab) for _ in range(30))
        rows.append((i, f"{hot} {body}"))
    # a genuinely near-duplicate pair (same body, one token changed)
    body = [rng.choice(vocab) for _ in range(40)]
    near = list(body)
    near[5] = "changed"
    rows.append((1001, " ".join(body)))
    rows.append((1002, " ".join(near)))
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    obs = Observation()
    result = ngram_jaccard_pairs(df, df_cap=64, observation=obs)
    # plan shape: the df-cap must act BEFORE collect_list (semi-join of
    # count-survivors under the list aggregate), so a hot shingle never
    # materializes its doc array in an aggregation buffer at all
    plan = result._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    assert plan.index("collect_list") < plan.rindex("LeftSemi"), (
        "collect_list must sit above the df-cap semi-join"
    )
    pairs = result.collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1001, 1002) in got
    # without the cap the hot shingle alone contributes C(302,2) ≈ 45k
    # candidate pairs; with it, output stays near the planted pair count
    assert len(got) < 100
    metrics = obs.get
    assert metrics["dropped_buckets"] >= 1
    assert metrics["max_df"] >= 300


def test_connected_components_resolves_chains_and_singletons(spark):
    """A 6-node chain (diameter 5 — forces multiple propagation rounds),
    a separate 2-clique, and an isolated node must resolve to min-label
    components."""
    from fastetl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (5, 4), (5, 6), (10, 11)],
        "doc_a long, doc_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 6, 10, 11, 99]], "doc_id long")
    got = {r.doc_id: r.component for r in connected_components(pairs, nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1, 10: 10, 11: 10, 99: 99}


def test_minhash_lsh_finds_planted_near_dups(spark):
    """Plant genuinely near-duplicate docs (90% token overlap) and check
    the LSH pipeline surfaces them as verified pairs."""
    import random

    from pyspark.sql import functions as F

    from fastetl_spark.operators.dedup import (
        _JACCARD_THRESHOLD,
        _M31,
        _SHINGLE_N,
        lsh_candidate_pairs,
        minhash_signature_from_hashes,
        shingle_hashes,
        word_tokens,
    )

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(200)]
    base = [rng.choice(vocab) for _ in range(120)]
    near = list(base)
    for idx in rng.sample(range(120), 8):  # ~7% token edits
        near[idx] = rng.choice(vocab)
    rows = [(1, " ".join(base)), (2, " ".join(near))]
    rows += [(i, " ".join(rng.choice(vocab) for _ in range(120))) for i in range(3, 40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    tok = df.select("doc_id", word_tokens(F.col("text")).alias("tokens"))
    sh = tok.select("doc_id", shingle_hashes(F.col("tokens"), _SHINGLE_N).alias("shingles"))
    hashed = sh.select(
        "doc_id",
        "shingles",
        F.transform("shingles", lambda s: F.pmod(s, F.lit(_M31))).alias("hs"),
    )
    sigs = hashed.select("doc_id", minhash_signature_from_hashes(F.col("hs")).alias("sig"))
    cands = {(r.id_a, r.id_b) for r in lsh_candidate_pairs(sigs, "doc_id", "sig").collect()}
    assert (1, 2) in cands  # the planted near-dup pair must be a candidate


def test_connected_components_chain_and_nonconvergence(spark):
    from fastetl_spark.operators.dedup import connected_components
    import pytest

    # a 6-node path graph: diameter 5, all one component
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 6)], "doc_a long, doc_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in range(1, 9)], "doc_id long")
    out = connected_components(pairs, nodes=nodes)
    got = {r["doc_id"]: r["component"] for r in out.collect()}
    assert all(got[i] == 1 for i in range(1, 7))  # chain collapses to min id
    assert got[7] == 7 and got[8] == 8  # isolated nodes are their own component

    # the distributed fixpoint (forced via driver_edge_cap=0) must agree
    # with the driver union-find exactly
    dist = connected_components(pairs, nodes=nodes, driver_edge_cap=0)
    assert {r["doc_id"]: r["component"] for r in dist.collect()} == got

    # an insufficient round budget must raise, not return split clusters
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes=nodes, max_iterations=1, driver_edge_cap=0)


def test_gini_udaf_matches_native_formula(spark, sf_dir):
    """The gated query is the r14 native decomposition on the rank
    primitive; the GROUPED_AGG pandas-UDAF demo and the window twin
    must both agree with it (the UDAF exactly — same quantized integer
    sums, tie-invariant — the double-sum window twin to tolerance)."""
    from fastetl_spark.operators.multimodal import (
        gini_by_event_type,
        gini_grouped_udaf,
        gini_native_twin,
    )

    gated = {r.event_type: r.gini for r in gini_by_event_type(spark, sf_dir).collect()}
    udaf = {r.event_type: r.gini for r in gini_grouped_udaf(spark, sf_dir).collect()}
    native = {r.event_type: r.gini for r in gini_native_twin(spark, sf_dir).collect()}
    assert set(udaf) == set(native) == set(gated)
    for k in udaf:
        assert gated[k] == udaf[k]
        assert abs(udaf[k] - native[k]) < 1e-9
        assert 0.0 <= udaf[k] < 1.0


def test_cogrouped_pandas_asof_matches_native(spark, sf_dir):
    from pyspark.sql import functions as F

    from fastetl_spark.operators.asof import asof_join, asof_join_cogrouped_pandas
    from fastetl_spark.io.readers import read_table

    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("cts"), F.col("event_id").alias("click_id")
    )
    native = asof_join(
        purchases, clicks.withColumnRenamed("cts", "ts"), "user_id", "ts", "ts", ["click_id"]
    )
    pandas_ver = asof_join_cogrouped_pandas(
        purchases, clicks, "user_id", "ts", "cts", "click_id"
    )
    a = sorted((r.event_id, r.click_id) for r in native.collect())
    b = sorted((r.event_id, r.click_id) for r in pandas_ver.collect())
    assert a == b


def test_incremental_dedup_matches_only_cross_side(spark):
    """New-batch-vs-corpus dedup: a planted near-dup across the split is
    found, within-side duplicates are NOT reported (the corpus is never
    self-joined), and a hot shingle shared by everything is capped."""
    import random

    from fastetl_spark.operators.dedup import incremental_jaccard_matches

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(400)]
    hot = "the quick fox"
    body = [rng.choice(vocab) for _ in range(40)]
    near = list(body)
    near[7] = "changed"
    other = [rng.choice(vocab) for _ in range(40)]
    corpus_rows = [(1, " ".join(body)), (2, " ".join(body)), (3, " ".join(other))]
    corpus_rows += [
        (10 + i, f"{hot} " + " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(200)
    ]
    inc_rows = [(1001, " ".join(near)), (1002, " ".join(other))]
    inc_rows += [
        (1100 + i, f"{hot} " + " ".join(rng.choice(vocab) for _ in range(30)))
        for i in range(50)
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    inc = spark.createDataFrame(inc_rows, "doc_id long, text string")

    got = {
        (r.new_doc, r.corpus_doc)
        for r in incremental_jaccard_matches(corpus, inc, df_cap=64).collect()
    }
    # the planted cross-side near-dups match BOTH identical corpus docs
    assert (1001, 1) in got and (1001, 2) in got
    assert (1002, 3) in got
    # within-side duplicate pair (1,2) must never appear in any column
    # combination, and the hot shingle contributes no pairs
    assert all(nd >= 1000 and cd < 1000 for nd, cd in got)
    assert len(got) < 20


def test_corpus_curator_funnel_and_single_pass(spark):
    """Planted digit spam, short docs, and exact dups must fall at the
    right stage; all stage counts come from observations on the ONE
    action (no per-stage count jobs); filters fuse into the scan."""
    from fastetl_spark.plans.curation_pipeline import CorpusCurator
    from pyspark.sql import functions as F

    base = "word " * 30  # 150 chars, passes the length floor
    rows = [
        (1, base + "alpha"),
        (2, base + "alpha"),          # exact dup of 1 -> dropped at dedup
        (3, base.upper() + "ALPHA"),  # normalized dup of 1 -> dropped
        (4, "short doc"),             # dropped at min_length
        (5, base + "123456789 " * 12),  # digit-heavy -> dropped at ratio
        (6, base + "unique tail"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    n_digits = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    curator = (
        CorpusCurator()
        .filter("min_length", F.length("text") >= 100)
        .filter("digit_ratio", n_digits * 100 <= 30 * F.length("text"))
        .dedup_exact_normalized()
    )
    curated, stats = curator.run(df)
    kept = sorted(r.doc_id for r in curated.collect())  # the one action
    assert kept == [1, 6]
    got = {name: n for _, name, n in stats()}
    assert got == {
        "raw": 6,
        "min_length": 5,      # doc 4 out
        "digit_ratio": 4,     # doc 5 out
        "dedup_normalized": 2,  # docs 2, 3 out (1 canonical by min id)
    }


def test_ivfpq_recall_and_index_shape(spark, sf_dir):
    """IVF-PQ must (a) carry only (id, cell, m 4-bit codes) in its
    index, (b) keep the cross join out of the plan, and (c) hit a
    recall floor vs brute force — the exact rerank of the PQ shortlist
    should land close to plain IVF's recall."""
    from fastetl_spark.operators.similarity import (
        PQ_KSUB,
        PQ_M,
        embedding_cosine_topk,
        similarity_ivfpq,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in embedding_cosine_topk(spark, sf_dir).collect()
    }
    df = similarity_ivfpq(spark, sf_dir)
    approx = {(r.query_id, r.neighbor_id) for r in df.collect()}
    assert approx and all(q != n for q, n in approx)
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.35, recall
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan

    # codes really are m small ints
    from fastetl_spark.operators.similarity import (
        _pq_encode_udf,
        pq_train_codebooks,
    )
    from fastetl_spark.io.readers import read_table
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "embeddings")
    books = pq_train_codebooks(e, "embedding", "vec_id")
    enc = _pq_encode_udf(books)
    codes = e.limit(20).select(enc(F.col("embedding").cast("array<double>")).alias("c"))
    for r in codes.collect():
        assert len(r.c) == PQ_M
        assert all(0 <= v < PQ_KSUB for v in r.c)


def test_shingle_index_matches_and_reads_only_touched_buckets(spark, sf_dir, tmp_path):
    """The persistent index must (a) reproduce incremental_jaccard_matches
    exactly, (b) read only the buckets the increment's shingles hash to,
    and (c) stay correct after an append-only update."""
    from fastetl_spark.io.bucketed import BUCKET_COL, bucket_id
    from fastetl_spark.operators.dedup import incremental_jaccard_matches
    from fastetl_spark.operators.dedup_index import (
        append_to_shingle_index,
        build_shingle_index,
        match_against_index,
        _shingle_rows,
    )

    d = read_table(spark, sf_dir, "documents")
    inc = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    idx = str(tmp_path / "shingle_idx")
    build_shingle_index(corpus, idx, n_buckets=16)

    got = sorted(
        (r.new_doc, r.corpus_doc, r.shared)
        for r in match_against_index(spark, idx, inc).collect()
    )
    want = sorted(
        (r.new_doc, r.corpus_doc, r.shared)
        for r in incremental_jaccard_matches(corpus, inc).collect()
    )
    assert got == want and got  # identical matches, non-empty

    # pruning: every file the match read lives in a touched bucket dir
    from fastetl_spark.io.bucketed import read_buckets_for_keys

    inc_shingles = _shingle_rows(inc, 3).select("shingle").distinct()
    touched = {
        r[0]
        for r in inc_shingles.select(bucket_id(["shingle"], 16)).distinct().collect()
    }
    read_df = read_buckets_for_keys(spark, idx, inc_shingles)
    index_files = [f for f in read_df.inputFiles() if f"{BUCKET_COL}=" in f]
    assert index_files  # the scan actually hit the index
    for f in index_files:
        bucket = int(f.split(f"{BUCKET_COL}=")[1].split("/")[0])
        assert bucket in touched

    # append-only maintenance: after indexing the increment itself, an
    # identical new batch matches against the APPENDED docs too
    append_to_shingle_index(inc, idx)
    again = match_against_index(spark, idx, inc)
    # every inc doc now matches itself in the index (jaccard 1.0)
    self_pairs = {(r.new_doc, r.corpus_doc) for r in again.collect()}
    ids = [r.doc_id for r in inc.select("doc_id").collect()]
    assert all((i, i) in self_pairs for i in ids)


@pytest.mark.slow  # full gate only: append/match correctness covered by test_shingle_index_matches_and_reads_only_touched_buckets + the shingle_index_match oracle gate (default profile); this adds the file-count bound sweep
def test_index_append_auto_compaction_bounds_file_counts(spark, sf_dir, tmp_path):
    """20 successive appends must NOT grow per-bucket file counts
    without bound: auto-compaction keeps every bucket at or under the
    threshold (compared against a compaction-disabled control which
    does blow past it), and match results are identical either way."""
    from fastetl_spark.io.bucketed import bucket_file_counts
    from fastetl_spark.operators.dedup_index import (
        append_to_shingle_index,
        build_shingle_index,
        match_against_index,
    )

    d = read_table(spark, sf_dir, "documents")
    inc = d.filter(F.col("doc_id") % 7 == 0).limit(20)
    corpus = d.filter(F.col("doc_id") % 7 != 0)
    threshold = 4
    idx = str(tmp_path / "auto")
    ctl = str(tmp_path / "ctl")
    build_shingle_index(corpus, idx, n_buckets=8)
    build_shingle_index(corpus, ctl, n_buckets=8)
    for i in range(20):
        batch = inc.withColumn("doc_id", F.col("doc_id") + F.lit(1000 * (i + 1)))
        append_to_shingle_index(batch, idx, compact_threshold=threshold)
        append_to_shingle_index(batch, ctl, compact_threshold=None)

    auto_counts = bucket_file_counts(spark, idx)
    ctl_counts = bucket_file_counts(spark, ctl)
    assert max(ctl_counts.values()) > threshold  # control proves growth
    assert max(auto_counts.values()) <= threshold  # compaction bounds it

    got = sorted(map(tuple, match_against_index(spark, idx, inc).collect()))
    want = sorted(map(tuple, match_against_index(spark, ctl, inc).collect()))
    assert got == want and got  # byte-identical matches


def test_minhash_index_candidates_and_verified_matches(spark, sf_dir, tmp_path):
    """The persistent LSH index must (a) produce the same cross-side
    candidate pairs as in-memory banding, and (b) with a doc-bucketed
    corpus attached, verify them to exact-jaccard matches that agree
    with incremental_jaccard_matches ABOVE the LSH recall floor (every
    verified match must BE a true match; planted near-dups must
    surface)."""
    from fastetl_spark.io.bucketed import write_bucketed
    from fastetl_spark.operators.dedup import incremental_jaccard_matches
    from fastetl_spark.operators.dedup_index import (
        append_to_minhash_index,
        build_minhash_index,
        match_minhash_index,
    )

    d = read_table(spark, sf_dir, "documents")
    inc = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(F.col("doc_id") % 7 != 0)

    idx = str(tmp_path / "lsh_idx")
    cpath = str(tmp_path / "corpus_b")
    build_minhash_index(corpus, idx, n_buckets=16)
    write_bucketed(corpus.select("doc_id", "text"), cpath, ["doc_id"], 16)

    cands = match_minhash_index(spark, idx, inc)
    assert cands.count() > 0
    assert cands.filter(F.col("n_bands") < 1).count() == 0

    verified = {
        (r.new_doc, r.corpus_doc)
        for r in match_minhash_index(spark, idx, inc, corpus_path=cpath).collect()
    }
    exact = {
        (r.new_doc, r.corpus_doc)
        for r in incremental_jaccard_matches(corpus, inc).collect()
    }
    assert verified, "LSH index found no verified matches"
    assert verified <= exact  # no false positives after exact verify
    assert len(verified) >= max(1, len(exact) // 2)  # recall floor

    # append-only maintenance: index the increment, rematch — inc docs
    # now collide with themselves in every band
    append_to_minhash_index(inc, idx)
    again = match_minhash_index(spark, idx, inc)
    self_hits = again.filter(F.col("new_doc") == F.col("corpus_doc"))
    assert self_hits.count() == 0  # self-pairs are filtered
    # but identical content across ids WOULD collide: planted twin
    twin = spark.createDataFrame(
        [(99001, inc.first().text)], "doc_id long, text string"
    )
    tw = match_minhash_index(spark, idx, twin)
    assert tw.filter(F.col("corpus_doc") == inc.first().doc_id).count() == 1


def test_minhash_index_portable_variant_detected_and_correct(spark, sf_dir, tmp_path):
    """The portable (md5-prefix, oracle-replicable) index variant must be
    auto-detected from the on-disk schema by append/match, and its
    verified matches must still be exact-Jaccard-true (subset of the
    exact incremental matcher's output)."""
    from fastetl_spark.io.bucketed import write_bucketed
    from fastetl_spark.operators.dedup import incremental_jaccard_matches
    from fastetl_spark.operators.dedup_index import (
        _index_is_portable,
        append_to_minhash_index,
        build_minhash_index,
        match_minhash_index,
    )

    d = read_table(spark, sf_dir, "documents")
    inc = d.filter(F.col("doc_id") % 7 == 0)
    corpus = d.filter(F.col("doc_id") % 7 != 0)

    idx = str(tmp_path / "lsh_idx_portable")
    cpath = str(tmp_path / "corpus_b")
    build_minhash_index(corpus, idx, n_buckets=16, portable=True)
    write_bucketed(corpus.select("doc_id", "text"), cpath, ["doc_id"], 16)
    assert _index_is_portable(spark, idx) is True

    verified = {
        (r.new_doc, r.corpus_doc)
        for r in match_minhash_index(spark, idx, inc, corpus_path=cpath).collect()
    }
    exact = {
        (r.new_doc, r.corpus_doc)
        for r in incremental_jaccard_matches(corpus, inc).collect()
    }
    assert verified and verified <= exact

    # append auto-detects the portable banding: a planted twin of an
    # appended doc must collide (it wouldn't if append hashed xxhash64)
    append_to_minhash_index(inc, idx)
    twin = spark.createDataFrame(
        [(99001, inc.first().text)], "doc_id long, text string"
    )
    tw = match_minhash_index(spark, idx, twin)
    assert tw.filter(F.col("corpus_doc") == inc.first().doc_id).count() == 1


def test_pagerank_conserves_mass_and_ranks_hubs(spark, sf_dir):
    """PageRank sanity: total mass stays ~1 (teleport + damped
    propagation is stochastic), and a node with an extra in-edge from
    the deterministic graph outranks the uniform baseline."""
    from fastetl_spark.operators.graph import pagerank_doc_graph

    rows = pagerank_doc_graph(spark, sf_dir).collect()
    total = sum(r.pr for r in rows)
    n = len(rows)
    assert abs(total - 1.0) < 1e-6
    assert all(r.pr > 0 for r in rows)
    # spread exists: the expander is not perfectly uniform
    prs = sorted(r.pr for r in rows)
    assert prs[-1] > prs[0]
