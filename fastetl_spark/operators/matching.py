"""Fuzzy string matching — the entity-resolution step of a cleaning
pipeline (the reference's mapping joins, patchwork.py, assume the
dictionary is already resolved; this operator builds that dictionary).

Design for 100 TB: fuzzy matching NEVER runs over the fact table. The
distinct value dictionary is extracted first (for a categorical-ish
column it is orders of magnitude smaller than the data — here 64 names
from 2 000 rows), pairs are generated dictionary x dictionary with a
length band, and the resolved mapping is then applied back to the facts
as a broadcast equi-join (J1/J2 machinery). The pair join is a
broadcast nested-loop by construction — correct because its inputs are
dictionaries, not data."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.checkpointing import materialize
from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.registry import query

_MAX_DIST = 4

_FUZZY_SQL = f"""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a JOIN names b
  ON a.p_name < b.p_name
 AND abs(length(a.p_name) - length(b.p_name)) <= {_MAX_DIST}
 AND levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
"""


@query("fuzzy_name_pairs", _FUZZY_SQL)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs of near-identical part names: distinct-name
    dictionary self-joined under an edit-distance threshold. The length
    band (|len diff| <= max dist, implied by the threshold, so it prunes
    without changing results) runs BEFORE levenshtein so most pairs are
    rejected by integer compare, not DP. Both engines implement standard
    Levenshtein — integer distances, no float drift."""
    # materialize the dictionary ONCE: both self-join sides derive from
    # this frame, and without the checkpoint each side would re-run the
    # distinct (a full fact-table scan apiece at 100 TB)
    names = (
        ensure_parallelism(read_table(spark, sf_dir, "part"))
        .select("p_name").distinct()
        .transform(materialize)
    )
    return fuzzy_pairs_from_names(names)


def fuzzy_pairs_from_names(names: DataFrame) -> DataFrame:
    """Length-banded edit-distance pair generation over an ALREADY
    materialized distinct-name dictionary — callers composing multiple
    stages on the same dictionary (entity_resolution_map) pass it once
    instead of re-scanning and re-distincting the fact table."""
    a = names.select(F.col("p_name").alias("name_a"), F.length("p_name").alias("len_a"))
    b = names.select(F.col("p_name").alias("name_b"), F.length("p_name").alias("len_b"))
    return (
        a.join(
            F.broadcast(b),
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= _MAX_DIST)
            & (F.levenshtein("name_a", "name_b") <= _MAX_DIST),
        )
        .select(
            "name_a",
            "name_b",
            F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        )
    )


_ER_SQL = f"""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name FROM part
), e AS (
  SELECT a.p_name AS na, b.p_name AS nb
  FROM names a JOIN names b
    ON a.p_name <> b.p_name
   AND abs(length(a.p_name) - length(b.p_name)) <= {_MAX_DIST}
   AND levenshtein(a.p_name, b.p_name) <= {_MAX_DIST}
), reach(a, b) AS (
  SELECT p_name, p_name FROM names
  UNION
  SELECT r.a, e.nb FROM reach r JOIN e ON e.na = r.b
), canon AS (
  SELECT a AS p_name, MIN(b) AS canonical FROM reach GROUP BY a
)
SELECT p_name, canonical,
       COUNT(*) OVER (PARTITION BY canonical) AS cluster_size
FROM canon
"""


@query("entity_resolution_map", _ER_SQL)
def entity_resolution_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full entity-resolution deliverable: fuzzy candidate pairs
    (fuzzy_name_pairs' dictionary self-join) resolved into TRANSITIVE
    clusters via connected components, each name mapped to its
    lexicographically-smallest reachable name as the canonical form —
    the mapping table the J1/J8 canonical-join machinery consumes.
    The oracle recomputes the closure with a recursive CTE, so the
    hash match proves pair generation AND transitive resolution.

    Scale shape: everything here runs on the distinct-name DICTIONARY
    (dedup.connected_components' size-adaptive resolver: driver
    union-find under the edge cap, iterative min-label propagation
    above it); the fact table is never touched."""
    from fastetl_spark.operators.dedup import connected_components

    names = (
        ensure_parallelism(read_table(spark, sf_dir, "part"))
        .select("p_name").distinct()
        .transform(materialize)
    )
    pairs = fuzzy_pairs_from_names(names)
    # `names` is already .distinct()-ed above — skip the re-distinct in
    # the attach join (r15)
    clusters = connected_components(
        pairs, nodes=names, a_col="name_a", b_col="name_b", id_col="p_name",
        nodes_unique=True,
    )
    from pyspark.sql.window import Window

    return clusters.select(
        "p_name",
        F.col("component").alias("canonical"),
        F.count(F.lit(1))
        .over(Window.partitionBy("component"))
        .alias("cluster_size"),
    )
