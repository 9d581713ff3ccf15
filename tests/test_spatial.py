"""Grid spatial join: the binned 3x3-neighborhood join must equal the
brute-force all-pairs spec on adversarial point sets (cell-edge
boundaries, co-located points, dense clusters), and the derived
stencil/k-NN queries must respect their structural invariants."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from fastetl_spark.operators.spatial import (
    _KNN_K,
    _RADIUS,
    grid_neighbor_pairs,
    spatial_grid_hotspots,
    spatial_points,
)


def _brute(rows, r2):
    out = set()
    for i, (ida, xa, ya) in enumerate(rows):
        for idb, xb, yb in rows[i + 1 :]:
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= r2:
                u, v = sorted((ida, idb))
                out.add((u, v, d2))
    return out


def _grid(spark, rows, r):
    pts = spark.createDataFrame(rows, "user_id long, x long, y long")
    got = grid_neighbor_pairs(pts, r=r).collect()
    pairs = [(r_.u, r_.v, r_.dist2) for r_ in got]
    assert len(pairs) == len(set(pairs)), "duplicate pairs from grid join"
    return set(pairs)


def test_grid_equals_brute_on_boundaries(spark):
    # points sitting exactly on cell edges and exactly at distance r
    r = 256
    rows = [
        (1, 0, 0),
        (2, 256, 0),      # exactly r apart, adjacent cells
        (3, 255, 0),      # within r, same-cell edge
        (4, 257, 0),      # beyond r from 1? 257 > 256 -> excluded vs id 1
        (5, 0, 256),
        (6, 256, 256),    # diagonal: sqrt(2)*256 > r from 1
        (7, 0, 0),        # co-located with 1 (distance 0)
        (8, 511, 511),
        (9, 512, 512),
    ]
    assert _grid(spark, rows, r) == _brute(rows, r * r)


def test_grid_equals_brute_on_random_clusters(spark):
    rng = random.Random(42)
    rows = []
    uid = 0
    # three dense clusters + uniform background
    for cx, cy in [(100, 100), (120, 130), (3000, 3000)]:
        for _ in range(40):
            rows.append((uid, cx + rng.randrange(60), cy + rng.randrange(60)))
            uid += 1
    for _ in range(80):
        rows.append((uid, rng.randrange(4096), rng.randrange(4096)))
        uid += 1
    for r in (64, 256):
        assert _grid(spark, rows, r) == _brute(rows, r * r)


def test_hotspot_stencil_invariants(spark, sf_dir):
    pts = spatial_points(spark, sf_dir)
    n_users = pts.count()
    cells = spatial_grid_hotspots(spark, sf_dir).collect()
    assert sum(c.n_points for c in cells) == n_users
    for c in cells:
        assert c.neighborhood_points >= c.n_points > 0


def test_knn_ranks_sorted_and_capped(spark):
    # synthetic cluster through the REAL production core: guaranteed
    # neighbors regardless of fixture SF (the 15-user sf0.001 scatter
    # can legitimately have zero pairs)
    from fastetl_spark.operators.spatial import knn_within_radius

    pts = spark.createDataFrame(
        [(i, 100 + 30 * i, 200 + 20 * (i % 4)) for i in range(8)]
        + [(99, 3900, 3900)],
        "user_id long, x long, y long",
    )
    rows = knn_within_radius(pts, r=_RADIUS).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r_ in rows:
        by_user.setdefault(r_.user_id, []).append(r_)
    assert 99 not in by_user  # the far outlier has no within-radius peer
    r2 = _RADIUS * _RADIUS
    for _, nbrs in by_user.items():
        nbrs.sort(key=lambda n: n.rank)
        assert [n.rank for n in nbrs] == list(range(1, len(nbrs) + 1))
        assert len(nbrs) <= _KNN_K
        dists = [n.dist2 for n in nbrs]
        assert dists == sorted(dists) and all(d <= r2 for d in dists)


def test_neighbor_pairs_partition_invariant(spark, sf_dir):
    base = spatial_points(spark, sf_dir)
    a = sorted(map(tuple, grid_neighbor_pairs(base).collect()))
    b = sorted(
        map(tuple, grid_neighbor_pairs(base.repartition(7, "user_id")).collect())
    )
    assert a == b


def test_grid_equals_brute_with_radius_larger_than_default_cell(spark):
    # regression: cell size must DERIVE from r — with a fixed 256 cell,
    # r=512 pairs spanning 2+ cells were silently dropped
    rows = [(1, 100, 0), (2, 612, 0), (3, 100, 512), (4, 2000, 2000),
            (5, 2500, 2400), (6, 90, 10)]
    for r in (512, 700):
        assert _grid(spark, rows, r) == _brute(rows, r * r)


def test_points_are_two_dimensional(spark, sf_dir):
    # regression: additive salts made y a near-copy of x (collinear)
    pts = spatial_points(spark, sf_dir).collect()
    xs = {p.x for p in pts}
    ys = {p.y for p in pts}
    diag = {(p.x - p.y) for p in pts}
    assert len(xs) > len(pts) // 4 and len(ys) > len(pts) // 4
    assert len(diag) > len(pts) // 4  # not on any shifted diagonal
