"""Grid-bucketed spatial operators (LLM-data / analytics extension).

Spark has no native spatial join; the scalable pattern is GRID BINNING:
snap every point to a cell of edge >= the search radius, shuffle once on
the cell key, and join each point against the 3x3 cell neighborhood that
provably contains every within-radius partner. Pair work is then
sum-over-cells(|cell| * |neighborhood|) instead of |points|^2 — the same
bound-the-candidates idea as LSH banding and IVF cells, applied to
2-D coordinates. The reference (fastETL) has no spatial surface; these
extend the engine the way a geo-tagged training corpus needs
(near-duplicate GPS points, density hotspots, per-region sampling).

Determinism: coordinates are derived from `user_id` by the same Knuth
multiplicative hash the sampling module uses (sampling.hash_bucket) —
pure integer arithmetic both engines reproduce exactly — and every
distance is an exact BIGINT squared-Euclidean, so all three queries sit
under the exact DuckDB hash gate with brute-force (not grid) oracles:
the oracle states the SPEC (all pairs within r), the Spark plan proves
the grid algorithm computes exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark.sql import Column

from fastetl_spark.io.readers import ensure_parallelism, read_table
from fastetl_spark.operators.sampling import _HASH_M, scramble
from fastetl_spark.registry import query

# Coordinate domain: 4096 x 4096 integer grid ("micro-degrees"); cell
# edge == radius, so a within-radius partner is always in the 3x3
# neighborhood. dx^2+dy^2 <= 2*4096^2 — comfortably BIGINT-exact.
_DOMAIN = 4096
_RADIUS = 256
_R2 = _RADIUS * _RADIUS
_CELL = _RADIUS  # stencil cell edge for the hotspot query

# Each coordinate uses its OWN odd multiplier (Knuth / xxhash public
# primes) and takes the TOP 12 bits of the 32-bit product. An additive
# salt on one multiplier would NOT decorrelate (y would be a near-copy
# of x: the +salt only shifts the same sequence), and the LOW bits of
# k*A mod 2^32 with a power-of-two modulus degenerate to raw id
# residues — both found in review; distinct multipliers + high bits
# give genuinely 2-D scattered points.
_MULT_X = 2654435761
_MULT_Y = 2246822519
_HI_SHIFT = _HASH_M // _DOMAIN  # 2^20: top 12 of 32 bits


def _coord(key: str, mult: int) -> Column:
    """Top-12-bits coordinate of (key * mult) mod 2^32
    (sampling.scramble — the shared overflow-safe split multiply).
    DuckDB twin: ``((key % 2^32) * mult) % 2^32 // 2^20`` in INT128."""
    return (scramble(key, mult) / F.lit(_HI_SHIFT)).cast("long")  # floor


_PTS_SQL = f"""
  SELECT user_id,
         ((user_id % {_HASH_M}) * {_MULT_X}) % {_HASH_M} // {_HI_SHIFT} AS x,
         ((user_id % {_HASH_M}) * {_MULT_Y}) % {_HASH_M} // {_HI_SHIFT} AS y
  FROM (SELECT DISTINCT user_id FROM events)
"""


def spatial_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One deterministic (x, y) point per distinct event user."""
    ev = ensure_parallelism(read_table(spark, sf_dir, "events"))
    return (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            _coord("user_id", _MULT_X).alias("x"),
            _coord("user_id", _MULT_Y).alias("y"),
        )
    )


def _offsets_3x3() -> Column:
    """Literal array of the nine (dx, dy) cell offsets."""
    return F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )


def grid_neighbor_pairs(
    pts: DataFrame, id_col: str = "user_id", r: int = _RADIUS
) -> DataFrame:
    """All unordered point pairs within Euclidean distance ``r`` via
    grid binning: snap to cells of edge exactly r (any r — the cell\n    size is DERIVED from the radius, preserving the 3x3 completeness\n    bound), explode the LEFT side into
    its 3x3 neighborhood, equi-join on the cell key, then apply the
    exact distance filter. Each qualifying pair matches exactly once
    (the right point's single cell meets exactly one of the left
    point's nine exploded cells; ``id < id`` kills the mirror).

    Scale shape: ONE shuffle on the cell key for each side (the explode
    is a 9x row fan-out before the exchange — the standard space/time
    trade of grid joins); no point ever compares outside its
    neighborhood, so pair work is density-bounded, not |pts|^2. Skewed
    cells (urban hotspots) are AQE-splittable because the join is a
    plain equi-join on (cx, cy)."""
    cell = max(int(r), 1)  # cell edge = radius: the 3x3 completeness bound
    cells = pts.select(
        F.col(id_col),
        "x",
        "y",
        # floor division (not a truncating cast) so cell labels stay
        # floor-consistent for negative coordinates too, matching the
        # oracle's floor semantics; identical on the non-negative fixture
        F.floor(F.col("x") / cell).alias("cx"),
        F.floor(F.col("y") / cell).alias("cy"),
    )
    a = (
        cells.withColumn("o", F.explode(_offsets_3x3()))
        .select(
            F.col(id_col).alias("u"),
            F.col("x").alias("ax"),
            F.col("y").alias("ay"),
            (F.col("cx") + F.col("o.dx")).alias("jx"),
            (F.col("cy") + F.col("o.dy")).alias("jy"),
        )
    )
    b = cells.select(
        F.col(id_col).alias("v"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        a.join(b, ["jx", "jy"])
        .filter(F.col("u") < F.col("v"))
        .withColumn("dist2", dist2)
        .filter(F.col("dist2") <= r * r)
        .select("u", "v", "dist2")
    )


_PAIRS_SQL = f"""
WITH pts AS ({_PTS_SQL})
SELECT a.user_id AS u, b.user_id AS v,
       (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
FROM pts a JOIN pts b ON a.user_id < b.user_id
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R2}
"""


@query("spatial_neighbor_pairs", _PAIRS_SQL)
def spatial_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All user pairs within radius {_RADIUS} on the {_DOMAIN}^2 grid.
    The oracle is the brute-force all-pairs SPEC; Spark runs the
    grid-binned 3x3-neighborhood equi-join, so a hash match proves the
    binning loses and duplicates nothing."""
    return grid_neighbor_pairs(spatial_points(spark, sf_dir))


_HOTSPOT_SQL = f"""
WITH pts AS ({_PTS_SQL}),
cells AS (
  SELECT x // {_CELL} AS cx, y // {_CELL} AS cy, COUNT(*) AS n_points
  FROM pts GROUP BY 1, 2
)
SELECT c.cx, c.cy, c.n_points,
       CAST((SELECT COALESCE(SUM(n.n_points), 0) FROM cells n
             WHERE n.cx BETWEEN c.cx - 1 AND c.cx + 1
               AND n.cy BETWEEN c.cy - 1 AND c.cy + 1) AS BIGINT)
         AS neighborhood_points
FROM cells c
"""


@query("spatial_grid_hotspots", _HOTSPOT_SQL)
def spatial_grid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Density stencil: per occupied cell, its own point count plus the
    3x3-neighborhood total (the smoothing pass of a hotspot detector).
    Computed as aggregate-then-stencil — points collapse to cell counts
    FIRST, then the 9-offset explode runs over the tiny cell table, so
    the fan-out cost is O(occupied cells), not O(points)."""
    pts = spatial_points(spark, sf_dir)
    cells = (
        pts.select(
            F.floor(F.col("x") / _CELL).alias("cx"),
            F.floor(F.col("y") / _CELL).alias("cy"),
        )
        .groupBy("cx", "cy")
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    contrib = cells.withColumn("o", F.explode(_offsets_3x3())).select(
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
        F.col("n_points").alias("c"),
    )
    smoothed = contrib.groupBy("cx", "cy").agg(
        F.sum("c").alias("neighborhood_points")
    )
    return cells.join(smoothed, ["cx", "cy"]).select(
        "cx", "cy", "n_points", "neighborhood_points"
    )


_KNN_K = 3

_KNN_SQL = f"""
WITH pts AS ({_PTS_SQL}),
cand AS (
  SELECT a.user_id AS u, b.user_id AS v,
         (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS dist2
  FROM pts a JOIN pts b ON a.user_id <> b.user_id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= {_R2}
)
SELECT u AS user_id, v AS neighbor_id, dist2, CAST(rn AS INT) AS rank
FROM (
  SELECT u, v, dist2,
         row_number() OVER (PARTITION BY u ORDER BY dist2, v) AS rn
  FROM cand
) t WHERE rn <= {_KNN_K}
"""


def knn_within_radius(
    pts: DataFrame, id_col: str = "user_id", r: int = _RADIUS, k: int = _KNN_K
) -> DataFrame:
    """Radius-capped k-NN over an (id, x, y) frame: both directions of
    the grid pair set, ranked per point by exact integer distance with
    id tie-break — the df-shaped core the gated query and the unit
    tests share."""
    pairs = grid_neighbor_pairs(pts, id_col=id_col, r=r)
    both = pairs.select(
        F.col("u").alias("user_id"), F.col("v").alias("neighbor_id"), "dist2"
    ).unionAll(
        pairs.select(
            F.col("v").alias("user_id"), F.col("u").alias("neighbor_id"), "dist2"
        )
    )
    w = Window.partitionBy("user_id").orderBy("dist2", "neighbor_id")
    return (
        both.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("user_id", "neighbor_id", "dist2", "rank")
    )


@query("spatial_knn_within_radius", _KNN_SQL)
def spatial_knn_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-capped k-NN ({_KNN_K} nearest within {_RADIUS}): the
    knn_within_radius core over the fixture point cloud. The radius cap
    is what keeps grid k-NN single-pass at scale — uncapped k-NN needs
    expanding-ring probes."""
    return knn_within_radius(spatial_points(spark, sf_dir))
