"""Entity resolution: string-keyed connected components and the
canonical-mapping invariants (total, idempotent, min-canonical)."""

from __future__ import annotations

from fastetl_spark.operators.dedup import connected_components
from fastetl_spark.operators.matching import entity_resolution_map


def test_components_over_string_nodes(spark):
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "d"), ("x", "y")], "name_a string, name_b string"
    )
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("x",), ("y",), ("z",)], "p_name string"
    )
    got = {
        r.p_name: r.component
        for r in connected_components(
            pairs, nodes=nodes, a_col="name_a", b_col="name_b", id_col="p_name"
        ).collect()
    }
    assert got == {
        "a": "a", "b": "b", "c": "b", "d": "b", "x": "x", "y": "x", "z": "z",
    }


def test_er_map_invariants(spark, sf_dir):
    from fastetl_spark.io.readers import read_table

    rows = entity_resolution_map(spark, sf_dir).collect()
    names = {
        r.p_name
        for r in read_table(spark, sf_dir, "part").select("p_name").distinct().collect()
    }
    mapped = {r.p_name: r.canonical for r in rows}
    assert set(mapped) == names  # total mapping
    by_canon: dict[str, list[str]] = {}
    for n, c in mapped.items():
        by_canon.setdefault(c, []).append(n)
    for r in rows:
        assert r.cluster_size == len(by_canon[r.canonical])
        assert r.canonical == min(by_canon[r.canonical])  # min representative
        assert mapped[r.canonical] == r.canonical  # idempotent
