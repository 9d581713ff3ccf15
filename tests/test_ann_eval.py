"""ann_recall_at_k structural invariants: hits are bounded by both k
and the probed-candidate count, every probe query reports, and the
single-probe recall actually separates from exhaustive (cells prune)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fastetl_spark.operators.ann_eval import ann_recall_at_k
from fastetl_spark.operators.similarity import QUERY_STRIDE, TOP_K
from fastetl_spark.io.readers import read_table


def test_recall_bounds_and_coverage(spark, sf_dir):
    rows = ann_recall_at_k(spark, sf_dir).collect()
    n_vecs = read_table(spark, sf_dir, "embeddings").count()
    expected_q = len(
        [i for i in range(n_vecs) if i % QUERY_STRIDE == 0]
    )
    assert len(rows) == expected_q
    for r in rows:
        assert 0 <= r.n_hit <= min(TOP_K, r.n_cands)
        assert 0 <= r.cell
    # pruned search must find at least SOME ground-truth neighbors
    assert sum(r.n_hit for r in rows) > 0


def test_recall_partition_invariant(spark, sf_dir):
    a = sorted(map(tuple, ann_recall_at_k(spark, sf_dir).collect()))
    defaults = {
        "spark.sql.shuffle.partitions": spark.conf.get(
            "spark.sql.shuffle.partitions"
        ),
        "spark.sql.adaptive.enabled": spark.conf.get("spark.sql.adaptive.enabled"),
    }
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "5")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        b = sorted(map(tuple, ann_recall_at_k(spark, sf_dir).collect()))
    finally:
        for k, v in defaults.items():
            spark.conf.set(k, v)
    assert a == b and a
