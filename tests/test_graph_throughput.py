"""PageRank throughput variant (round-5): groupBy-SUM fold must agree
with the oracle-gated ordered fold to 1e-9, and the crawl-style edge
resolution must only produce edges the fixture actually encodes."""

from __future__ import annotations

import pyspark.sql.functions as F

from fastetl_spark.io.readers import read_table


def test_throughput_fold_matches_exact_to_1e9(spark, sf_dir):
    from fastetl_spark.operators.graph import _doc_graph, pagerank

    d = read_table(spark, sf_dir, "documents")
    nodes, edges = _doc_graph(d, d.count())
    exact = {r.node: r.pr for r in pagerank(nodes, edges).collect()}
    fast = {r.node: r.pr for r in pagerank(nodes, edges, exact=False).collect()}
    assert exact.keys() == fast.keys()
    assert max(abs(exact[n] - fast[n]) for n in exact) < 1e-9
    # and the throughput plan really is the list-free aggregate
    plan = pagerank(nodes, edges, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan


def _powerlaw_graph(spark, n_nodes=12_000, n_edges=120_000):
    """Deterministic power-law-ish edge fixture: node 0 absorbs 10% of
    all edges (every 10th edge), the rest scatter via a Knuth-multiplier
    scramble — the hub in-degree (~12k) is three orders of magnitude
    above the mean (~10), the skew shape that kills a naive hot-reducer
    plan at scale."""
    nodes = spark.range(n_nodes).select(F.col("id").alias("node"))
    edges = spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        F.when(F.col("id") % 10 == 0, F.lit(0))
        .otherwise((F.col("id") * 2654435761) % n_nodes)
        .alias("dst"),
    )
    return nodes, edges


def test_powerlaw_hub_skew_stress(spark):
    """The round-5 verdict's skew ask: on a graph where the top node
    receives ~10% of ALL edges, the throughput fold must (a) keep the
    list-free map-side-combined aggregate in its physical plan — the
    hub's contributions partial-sum inside every map task, so no single
    reducer ever materializes an in-neighbor list — and (b) still agree
    with the exact ordered fold to 1e-9. Wall-clock headroom vs the
    exact fold is recorded in PERF.md, not asserted (co-tenant noise)."""
    from fastetl_spark.operators.graph import pagerank

    nodes, edges = _powerlaw_graph(spark)
    fast_df = pagerank(nodes, edges, exact=False)
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    assert "collect_list" not in plan
    assert "partial_sum" in plan  # map-side combine ate the hub skew
    fast = {r.node: r.pr for r in fast_df.collect()}
    exact = {r.node: r.pr for r in pagerank(nodes, edges).collect()}
    assert exact.keys() == fast.keys()
    assert max(abs(exact[n] - fast[n]) for n in exact) < 1e-9
    # the hub really is a hub, and total mass is conserved
    assert fast[0] == max(fast.values())
    assert abs(sum(fast.values()) - 1.0) < 1e-6


def test_resolved_link_edges_match_fixture_arithmetic(spark, sf_dir):
    from fastetl_spark.operators.graph import resolved_link_edges

    d = read_table(spark, sf_dir, "documents")
    src_of = {r.doc_id: r.source for r in d.select("doc_id", "source").collect()}
    edges = resolved_link_edges(spark, sf_dir).collect()
    got = sorted((r.src, r.dst) for r in edges)
    want = sorted(
        [
            (a, (a + 1) % 1000)
            for a in src_of
            if src_of.get((a + 1) % 1000) == src_of[a]
        ]
        + [(a, a % 20) for a in src_of if src_of.get(a % 20) == src_of[a]]
    )
    assert got == want and got
    # hub skew exists: in-links concentrate on a small set of hub docs
    # (most docs receive none), the shape the throughput fold targets
    from collections import Counter

    indeg = Counter(dst for _, dst in got)
    assert len(indeg) <= len(src_of) // 5  # few distinct targets
    assert max(indeg.values()) >= 10  # each absorbing many in-links


def test_label_propagation_separates_cliques(spark):
    """Two 5-cliques joined by one bridge edge: LPA must converge each
    clique to its own minimum label and never merge them through the
    bridge (the bridge endpoint sees 4 clique votes vs 1 outside vote)."""
    from pyspark.sql import functions as F

    from fastetl_spark.operators.graph import label_propagation

    c1, c2 = list(range(5)), list(range(10, 15))
    edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
    edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
    edges += [(4, 10)]  # bridge
    nodes = spark.createDataFrame([(n,) for n in c1 + c2], ["node"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(nodes, e, iterations=4).collect()
    }
    assert {got[n] for n in c1} == {0}
    assert {got[n] for n in c2} == {10}


def test_label_propagation_isolated_nodes_keep_labels(spark):
    from fastetl_spark.operators.graph import label_propagation

    nodes = spark.createDataFrame([(1,), (2,), (7,)], ["node"])
    e = spark.createDataFrame([(1, 2)], ["src", "dst"])
    got = {
        r["node"]: r["community"]
        for r in label_propagation(nodes, e, iterations=3).collect()
    }
    assert got[7] == 7  # no neighbors: label carried through every round
    # neighbor-only SYNC updates make an isolated pair swap labels each
    # round (the textbook sync-LPA oscillation — deterministic, and why
    # the gated query pins a FIXED iteration count): odd rounds = swapped
    assert got[1] == 2 and got[2] == 1


def test_kcore_peel_extracts_dense_subgraph(spark):
    """A 5-clique with pendant chains: 4 rounds of k=3 peeling must keep
    exactly the clique (every clique node has degree 4 within it) and
    remove every chain node (cascade: the tip has degree 1, then its
    parent, ...)."""
    from fastetl_spark.operators.graph import kcore_peel

    clique = list(range(5))
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    # chains hanging off node 0: 10-11-12 and 13-14
    edges += [(0, 10), (10, 11), (11, 12), (0, 13), (13, 14)]
    all_nodes = clique + [10, 11, 12, 13, 14]
    nodes = spark.createDataFrame([(x,) for x in all_nodes], ["node"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["deg"] for r in kcore_peel(nodes, e, k=3, rounds=4).collect()}
    assert set(got) == set(clique)
    assert all(d == 4 for d in got.values())


# --- convergence-driven fixpoint modes (round 8) ---------------------------


def test_kcore_fixpoint_equals_converged_prefix(spark):
    """rounds=None (loop until zero removals) must equal any fixed
    prefix that overshoots convergence — the relation the gated
    kcore_fixpoint query relies on — and keep shrinking past the short
    prefix the fixed-round twin pins."""
    from fastetl_spark.operators.graph import kcore_peel

    clique = list(range(5))
    edges = [(a, b) for i, a in enumerate(clique) for b in clique[i + 1:]]
    # k=2 on a chain is a genuine one-tip-per-round cascade (interior
    # chain nodes hold degree 2 until their outer neighbor peels)
    chain = [0, 10, 11, 12, 13, 14, 15]
    edges += list(zip(chain, chain[1:]))
    nodes = spark.createDataFrame(
        [(x,) for x in clique + chain[1:]], ["node"]
    )
    e = spark.createDataFrame(edges, ["src", "dst"])
    fix = sorted(
        map(tuple, kcore_peel(nodes, e, k=2, rounds=None).collect())
    )
    deep = sorted(
        map(tuple, kcore_peel(nodes, e, k=2, rounds=10).collect())
    )
    assert fix == deep
    assert {n for n, _ in fix} == set(clique)
    # a 2-round prefix has NOT converged yet (chain only partly peeled)
    short = {r["node"] for r in kcore_peel(nodes, e, k=2, rounds=2).collect()}
    assert set(clique) < short


def test_label_propagation_converge_mode(spark):
    """converge=True stops at the first zero-change round and matches
    any deeper fixed prefix on a converging fixture; on the textbook
    sync-LPA oscillator it DETECTS the period-2 cycle (labels(t) ==
    labels(t-2)), stops deterministically, returns the
    higher-modularity side, and reports the termination story through
    ``info`` instead of silently truncating at the cap."""
    from pyspark.sql import functions as F  # noqa: F401

    from fastetl_spark.operators.graph import label_propagation

    c1, c2 = list(range(5)), list(range(10, 15))
    edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
    edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
    edges += [(4, 10)]
    nodes = spark.createDataFrame([(n,) for n in c1 + c2], ["node"])
    e = spark.createDataFrame(edges, ["src", "dst"])
    cinfo: dict = {}
    conv = sorted(
        map(
            tuple,
            label_propagation(nodes, e, converge=True, info=cinfo).collect(),
        )
    )
    assert conv == sorted(
        map(tuple, label_propagation(nodes, e, iterations=8).collect())
    )
    assert cinfo["converged"] and not cinfo["two_cycle"]
    assert 1 <= cinfo["rounds"] <= 8
    # oscillator: isolated edge swaps labels every round, no fixpoint.
    # The two-cycle is caught at round 2 (NOT the round-50 default cap);
    # both cycle sides have equal Q here (-0.5), so the later round —
    # the identity labeling — wins the deterministic tie-break
    onodes = spark.createDataFrame([(1,), (2,)], ["node"])
    oe = spark.createDataFrame([(1, 2)], ["src", "dst"])
    oinfo: dict = {}
    osc = {
        r["node"]: r["community"]
        for r in label_propagation(
            onodes, oe, converge=True, info=oinfo
        ).collect()
    }
    assert {k: oinfo[k] for k in ("converged", "two_cycle", "rounds")} == {
        "converged": False, "two_cycle": True, "rounds": 2
    }
    assert oinfo["und"] is not None  # the reusable symmetrized frame
    assert osc == {1: 1, 2: 2}


def test_modularity_terms_exact_values(spark):
    """Two 4-cliques, no bridge: perfect 2-community partition. Each
    clique: within2 = 12 (6 edges x2), degree_sum = 12, M2 = 24 ->
    q_term = (12*24 - 144)/576 = 0.25 each, Q = 0.5 — the textbook
    value for two equal disconnected cliques."""
    from fastetl_spark.operators.graph import modularity_terms

    c1, c2 = list(range(4)), list(range(10, 14))
    edges = [(a, b) for i, a in enumerate(c1) for b in c1[i + 1:]]
    edges += [(a, b) for i, a in enumerate(c2) for b in c2[i + 1:]]
    e = spark.createDataFrame(edges, ["src", "dst"])
    labels = spark.createDataFrame(
        [(n, 0) for n in c1] + [(n, 10) for n in c2], ["node", "community"]
    )
    got = {r["community"]: r for r in modularity_terms(labels, e).collect()}
    assert set(got) == {0, 10}
    for c in (0, 10):
        assert got[c]["within2"] == 12
        assert got[c]["degree_sum"] == 12
        assert got[c]["q_term"] == 0.25
    # the all-one-community partition of the same graph scores lower
    # (Q = 1 - 1 = 0): modularity must rank the true split above it
    one = labels.select("node", F.lit(0).alias("community"))
    q_one = sum(r["q_term"] for r in modularity_terms(one, e).collect())
    assert abs(q_one) < 1e-12
    # PARTIAL label coverage: labeling only clique 1 must score the
    # INDUCED subgraph (one lone complete component -> Q = 0, M2 = 12
    # from the labeled join), not mix labeled numerators with the
    # full-graph M2 = 24 normalizer (which would understate/misstate Q)
    part = {
        r["community"]: r
        for r in modularity_terms(labels.filter("community = 0"), e).collect()
    }
    assert set(part) == {0}
    assert part[0]["within2"] == 12 and part[0]["degree_sum"] == 12
    assert part[0]["q_term"] == 0.0  # (12*12 - 12*12) / 12^2


def test_modularity_terms_prebuilt_und_matches_edges_path(spark):
    """Passing the pre-symmetrized+distinct edge frame as ``und``
    (label_propagation's two-cycle termination does this to skip two
    corpus-sized re-symmetrize shuffles — round-9 ADVICE) yields the
    exact same terms as the edges path, including with self-loops and
    duplicate/reversed input edges present."""
    from fastetl_spark.checkpointing import materialize
    from fastetl_spark.operators.graph import modularity_terms

    raw = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 0), (2, 2), (0, 1),
           (10, 11), (11, 12), (12, 10)]
    e = spark.createDataFrame(raw, ["src", "dst"])
    labels = spark.createDataFrame(
        [(n, 0) for n in range(4)] + [(n, 10) for n in (10, 11, 12)],
        ["node", "community"],
    )
    und = materialize(
        e.select("src", "dst")
        .unionAll(e.select(F.col("dst").alias("src"),
                           F.col("src").alias("dst")))
        .distinct()
    )
    via_edges = sorted(map(tuple, modularity_terms(labels, e).collect()))
    via_und = sorted(map(tuple, modularity_terms(labels, und=und).collect()))
    assert via_edges == via_und and len(via_edges) == 2
