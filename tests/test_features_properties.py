"""Property-based checks for the feature/curation exactness claims:
chunking covers and reconstructs arbitrary text, the integer rank
formula matches exact rational arithmetic, and quantized-cosine
decisions are partitioning-invariant.
"""

from __future__ import annotations

from fractions import Fraction

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=1, max_value=10**9), st.sampled_from([5, 25, 50, 95, 99]))
def test_integer_rank_formula_matches_exact_rational(n, pct):
    """(pct*(n-1)) // 100 == floor of the exact rational pct/100*(n-1):
    the arithmetic winsorize_event_values relies on (a float product
    provably disagrees at n-1 % 20 == 0 for pct=95)."""
    assert (pct * (n - 1)) // 100 == (Fraction(pct, 100) * (n - 1)).__floor__()


@settings(max_examples=30, deadline=None)
@given(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FFF), min_size=0, max_size=400),
    st.integers(min_value=2, max_value=50),
    st.integers(min_value=1, max_value=50),
)
def test_chunk_walk_covers_and_reconstructs(text, width, stride):
    """Pure-python model of the chunk walk (starts 1, 1+s, ... <= max(len,1)):
    chunks cover the text end, and stride-prefixes + last chunk
    reconstruct it when stride <= width."""
    stride = min(stride, width)
    n = len(text)
    starts = list(range(0, max(n, 1), stride))
    chunks = [text[s : s + width] for s in starts]
    if n == 0:
        assert chunks == [""]
        return
    assert starts[-1] + len(chunks[-1]) == n  # last chunk reaches the end
    rebuilt = "".join(c[:stride] for c in chunks[:-1]) + chunks[-1]
    assert rebuilt == text


def test_chunk_text_matches_python_model(spark):
    """The Spark generator agrees with the python walk on awkward
    lengths (empty, < width, == width, == stride multiples, long)."""
    from fastetl_spark.operators.features import chunk_text

    cases = ["", "a", "x" * 149, "x" * 150, "x" * 151, "x" * 200, "ab" * 500]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in chunk_text(df, width=200, stride=150).collect()
    }
    for i, t in enumerate(cases):
        starts = list(range(0, max(len(t), 1), 150))
        for j, s in enumerate(starts, start=1):
            assert got[(i, j)] == t[s : s + 200]
        assert len([k for k in got if k[0] == i]) == len(starts)


def test_semantic_dedup_partitioning_invariant(spark):
    """Exact-integer decisions: the same corpus through 1, 3, and 13
    partitions yields byte-identical keep/drop results."""
    from fastetl_spark.operators.curation2 import semantic_dedup

    base = [
        (i, [float((i * 11 + k * 5) % 17 - 8) / 8.0 for k in range(8)])
        for i in range(60)
    ]
    df = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    ref = sorted(
        map(tuple, semantic_dedup(df, "vec_id", "embedding", n_centroids=4).collect())
    )
    for k in (3, 13):
        got = sorted(
            map(
                tuple,
                semantic_dedup(
                    df.repartition(k), "vec_id", "embedding", n_centroids=4
                ).collect(),
            )
        )
        assert got == ref, f"partitioning {k} changed results"


def test_decayed_score_power_of_two_exactness():
    """floor(q / 2^k) in double equals exact integer floor division for
    the full magnitude range the operator can see (|q| <= ~1e10)."""
    import math

    for q in [0, 1, -1, 999_999, -999_999, 10_000_000_000, -10_000_000_000, 3, -3]:
        for k in range(0, 13):
            assert math.floor(q / (2.0**k)) == q // (2**k), (q, k)
