"""Property tests: pointer-jumping SCC and rank-sum AUC against
independent brute-force Python references on random inputs — the
invariants the oracle gate can't probe (it sees one graph family and
one score column)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from fastetl_spark.operators.evaluation import auc_by_class
from fastetl_spark.operators.graph import functional_scc

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _brute_scc(succ: dict[int, int]) -> dict[int, tuple[int, bool]]:
    """Reference: walk each node to detect its cycle, assign min-of-
    cycle to cycle nodes, self to tails."""
    out = {}
    for u in succ:
        seen = {}
        v, i = u, 0
        while v not in seen:
            seen[v] = i
            v, i = succ[v], i + 1
        cycle = [w for w, j in seen.items() if j >= seen[v]]
        on_cycle = u in cycle
        out[u] = (min(cycle) if on_cycle else u, on_cycle)
    return out


@given(
    st.integers(min_value=1, max_value=40).flatmap(
        lambda n: st.lists(
            st.integers(min_value=0, max_value=n - 1),
            min_size=n, max_size=n,
        )
    )
)
@settings(**SETTINGS)
def test_functional_scc_matches_brute_force(spark, succs):
    succ = {i: s for i, s in enumerate(succs)}
    f = spark.createDataFrame(
        [(k, v) for k, v in succ.items()], "node long, succ long"
    )
    got = {
        r["node"]: (r["scc_id"], r["on_cycle"])
        for r in functional_scc(f, n=len(succ)).collect()
    }
    assert got == _brute_scc(succ)


def _brute_auc(pos: list[float], neg: list[float]) -> float:
    wins = sum(1 for p in pos for q in neg if p > q)
    ties = sum(1 for p in pos for q in neg if p == q)
    return (2 * wins + ties) / (2 * len(pos) * len(neg))


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["a", "b"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=2, max_size=60,
    ).filter(lambda rows: len({c for c, _ in rows}) == 2)
)
@pytest.mark.slow  # full gate only: AUC exactness runs in the default profile via the auc_score_eval oracle gate + test_auc_binned_equals_exact_when_bins_cover; this adds the randomized brute-force sweep
@settings(**SETTINGS)
def test_auc_matches_brute_force_pairs(spark, rows):
    df = spark.createDataFrame(
        [(c, float(s)) for c, s in rows], "cls string, score double"
    )
    got = {r["cls"]: r["auc"] for r in auc_by_class(df, "cls", "score").collect()}
    a = [float(s) for c, s in rows if c == "a"]
    b = [float(s) for c, s in rows if c == "b"]
    assert got["a"] == _brute_auc(a, b)
    assert got["b"] == _brute_auc(b, a)
