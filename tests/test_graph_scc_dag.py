"""Hand-built-graph checks for pointer-jumping SCC and DAG levels
(the oracle gate covers the doc-graph instantiations; these pin the
operator semantics on graphs small enough to verify by eye)."""

from __future__ import annotations

from fastetl_spark.operators.graph import dag_longest_levels, functional_scc


def test_functional_scc_cycle_and_tails(spark):
    # 0 -> 1 -> 2 -> 0 (cycle), 3 -> 0 and 4 -> 3 (tail chain),
    # 5 -> 5 (self-loop cycle)
    f = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 0), (4, 3), (5, 5)],
        "node long, succ long",
    )
    rows = {r["node"]: r for r in functional_scc(f, n=6).collect()}
    assert [rows[i]["scc_id"] for i in range(6)] == [0, 0, 0, 3, 4, 5]
    assert [rows[i]["on_cycle"] for i in range(6)] == [
        True, True, True, False, False, True,
    ]


def test_functional_scc_two_cycles(spark):
    # two disjoint 2-cycles: {10, 11} and {20, 21}
    f = spark.createDataFrame(
        [(10, 11), (11, 10), (20, 21), (21, 20)], "node long, succ long"
    )
    rows = {r["node"]: r["scc_id"] for r in functional_scc(f, n=4).collect()}
    assert rows == {10: 10, 11: 10, 20: 20, 21: 20}


def test_dag_longest_levels_diamond(spark):
    # 0 -> 1 -> 3, 0 -> 2 -> 3, 2 -> 4; longest paths: 1/1/2/2... by eye:
    # lv(0)=0, lv(1)=1, lv(2)=1, lv(3)=2, lv(4)=2; isolated 5 stays 0
    nodes = spark.createDataFrame([(i,) for i in range(6)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 3), (2, 3), (2, 4)], "src long, dst long"
    )
    rows = {r["node"]: r["level"]
            for r in dag_longest_levels(nodes, edges, rounds=4).collect()}
    assert rows == {0: 0, 1: 1, 2: 1, 3: 2, 4: 2, 5: 0}


def test_dag_longest_levels_takes_max_not_min(spark):
    # 0 -> 3 directly AND 0 -> 1 -> 2 -> 3: level(3) must be 3, not 1
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edges = spark.createDataFrame(
        [(0, 3), (0, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    rows = {r["node"]: r["level"]
            for r in dag_longest_levels(nodes, edges, rounds=5).collect()}
    assert rows[3] == 3


def test_two_phase_star_cc_hand_built(spark):
    from fastetl_spark.operators.graph import two_phase_star_cc

    # component {1,5,9,30} (min in "middle" of the edge list), pair
    # {2,7}, isolated 4 attached via nodes
    edges = spark.createDataFrame(
        [(5, 9), (9, 30), (30, 1), (2, 7)], "src long, dst long"
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 4, 5, 7, 9, 30]], "node long"
    )
    rows = {r["node"]: r["component"]
            for r in two_phase_star_cc(edges, nodes=nodes).collect()}
    assert rows == {1: 1, 5: 1, 9: 1, 30: 1, 2: 2, 7: 2, 4: 4}


def test_two_phase_star_cc_long_path(spark):
    from fastetl_spark.operators.graph import two_phase_star_cc

    # a 40-node path with the min at one end: stresses the round count
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    rows = {r["node"]: r["component"]
            for r in two_phase_star_cc(edges).collect()}
    assert rows == {i: 0 for i in range(41)}


def test_functional_scc_dangling_successor_kept(spark):
    from fastetl_spark.operators.graph import functional_scc

    # 0 -> 1 -> 99 where 99 has no out-edge (dangling): both nodes are
    # singleton tails, neither may vanish from the output
    f = spark.createDataFrame([(0, 1), (1, 99)], "node long, succ long")
    rows = {r["node"]: (r["scc_id"], r["on_cycle"])
            for r in functional_scc(f, n=2).collect()}
    assert rows == {0: (0, False), 1: (1, False)}


def test_two_phase_star_cc_raises_when_unconverged(spark):
    import pytest as _pytest

    from fastetl_spark.operators.graph import two_phase_star_cc

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        two_phase_star_cc(edges, max_rounds=1)


def test_dag_longest_levels_raises_on_short_bound(spark):
    # a 4-hop chain cannot converge in 2 rounds: must fail loudly
    # instead of returning short levels (the r10 ADVICE finding)
    import pytest

    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="frontier still has"):
        dag_longest_levels(nodes, edges, rounds=2)


def test_dag_longest_levels_frontier_converges_early(spark):
    # generous bound: converges by empty frontier, extra rounds unused
    nodes = spark.createDataFrame([(i,) for i in range(3)], "node long")
    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    rows = {r["node"]: r["level"]
            for r in dag_longest_levels(nodes, edges, rounds=50).collect()}
    assert rows == {0: 0, 1: 1, 2: 2}


def test_dag_longest_levels_tight_bound_is_sufficient(spark):
    # the r11 ADVICE finding: a 4-hop chain with rounds=4 (the EXACT
    # longest-path length — the docstring's "provable bound") reaches
    # the fixpoint in round 4 and must NOT raise; the extra
    # confirmation round proves convergence instead
    nodes = spark.createDataFrame([(i,) for i in range(5)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4)], "src long, dst long"
    )
    rows = {r["node"]: r["level"]
            for r in dag_longest_levels(nodes, edges, rounds=4).collect()}
    assert rows == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
