"""Join operators vs brute-force goldens (FIXTURES.md F4: PIP and kNN have
no reference analog — self-consistency against small-N brute force)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from veranda_spark.functions.geometry import points_in_polygon
from veranda_spark.grid import RegularGrid
from veranda_spark.operators.joins import (
    cell_histogram,
    derive_salt_map,
    knn_join,
    pip_join,
    point_in_tile_join,
    salted_broadcast_join,
)

N = 3000


@pytest.fixture(scope="module")
def points(spark):
    # deterministic integer points in a 1024x1024 world (y negative = south)
    df = spark.range(N).select(
        F.col("id").alias("point_id"),
        ((F.col("id") * 7919) % 1024).alias("px"),
        (-((F.col("id") * 104729) % 1024)).alias("py"),
    )
    return df.cache()


def _points_np():
    ids = np.arange(N)
    return ids, (ids * 7919) % 1024, -((ids * 104729) % 1024)


TRIANGLE = [(100.5, -100.5), (900.5, -150.5), (500.5, -900.5)]
SQUARE = [(0.5, -0.5), (200.5, -0.5), (200.5, -200.5), (0.5, -200.5)]


def test_pip_join_matches_bruteforce(spark, points):
    got = pip_join(points, {"tri": TRIANGLE, "sq": SQUARE}).collect()
    ids, xs, ys = _points_np()
    want = set()
    for pid, poly in [("tri", TRIANGLE), ("sq", SQUARE)]:
        inside = points_in_polygon(xs.astype(float), ys.astype(float), np.array(poly))
        want |= {(pid, int(i)) for i in ids[inside]}
    assert {(r["polygon_id"], r["point_id"]) for r in got} == want
    assert len(want) > 50


def test_pip_join_classified_cover_edge_and_concave(spark):
    # round-9 regression: the cell cover is now classified
    # (outside-dropped / full-skip / boundary ray-cast).  This pins the
    # classification against brute force for (a) points EXACTLY on
    # polygon edges — they live in boundary cells, so the r1-r8
    # half-open ray-cast convention must be preserved bit-for-bit, (b) a
    # CONCAVE polygon whose bbox contains cells fully outside the
    # polygon (the dropped-cell and full-cell classes both appear), and
    # (c) interior points in full cells (skip path).
    concave = [(10.0, -10.0), (700.0, -10.0), (700.0, -700.0),
               (360.0, -360.0), (10.0, -700.0)]  # notch up the middle
    square = [(64.0, -64.0), (512.0, -64.0), (512.0, -512.0),
              (64.0, -512.0)]  # integer-vertex: real on-edge points exist
    ids = np.arange(N)
    xs, ys = (ids * 7919) % 1024, -((ids * 104729) % 1024)
    df = spark.createDataFrame(
        [(int(i), int(x), int(y)) for i, x, y in zip(ids, xs, ys)],
        "point_id long, px long, py long",
    )
    got = pip_join(df, {"cv": concave, "sq": square}).collect()
    want = set()
    n_on_edge = 0
    for pid, poly in [("cv", concave), ("sq", square)]:
        inside = points_in_polygon(
            xs.astype(float), ys.astype(float), np.array(poly)
        )
        want |= {(pid, int(i)) for i in ids[inside]}
        if pid == "sq":
            on_edge = (
                ((xs == 64) | (xs == 512)) & (ys <= -64) & (ys >= -512)
            ) | (((ys == -64) | (ys == -512)) & (xs >= 64) & (xs <= 512))
            n_on_edge = int(on_edge.sum())
    assert {(r["polygon_id"], r["point_id"]) for r in got} == want
    assert len(want) > 100 and n_on_edge > 0  # edge cases actually present


@pytest.mark.parametrize("k", [1, 5, 20])
def test_knn_matches_bruteforce(spark, points, k):
    rng = np.random.default_rng(42)
    qpts = [(int(i), int(x), -int(y)) for i, (x, y) in enumerate(rng.integers(0, 1024, (25, 2)))]
    queries = spark.createDataFrame(qpts, schema="query_id long, qx long, qy long")
    got = knn_join(points, queries, k=k, res=5).collect()
    ids, xs, ys = _points_np()
    for qid, qx, qy in qpts:
        d2 = (xs - qx) ** 2 + (ys - qy) ** 2
        order = np.lexsort((ids, d2))[:k]
        want = [(int(ids[j]), int(d2[j])) for j in order]
        mine = sorted(
            [(r["point_id"], r["dist_sq"]) for r in got if r["query_id"] == qid],
            key=lambda t: (t[1], t[0]),
        )
        assert mine == want, f"query {qid} k={k}"


def test_point_in_tile_join(spark, points):
    grid = RegularGrid(tile_cols=128, tile_rows=128, n_tile_cols=8, n_tile_rows=8)
    tiles = grid.tiles_df(spark)
    got = point_in_tile_join(points, tiles, grid).select("point_id", "tile_id").collect()
    assert len(got) == N  # every point lands in exactly one tile
    ids, xs, ys = _points_np()
    lookup = {int(i): f"{int(-y) // 128}_{int(x) // 128}" for i, x, y in zip(ids, xs, ys)}
    for r in got:
        assert r["tile_id"] == lookup[r["point_id"]]


def test_salted_join_equals_plain_join(spark, points):
    # hotspot: all points share few cells → salted join must not change results
    small = spark.createDataFrame(
        [(int(c), f"meta_{c}") for c in range(8)], schema="key long, meta string"
    )
    big = points.withColumn("key", F.col("point_id") % 8)
    plain = big.join(small, "key").select("point_id", "meta")
    salted = salted_broadcast_join(big, small, "key", salt_map={0: 4, 1: 8})
    got = salted.select("point_id", "meta").collect()
    assert sorted((r["point_id"], r["meta"]) for r in got) == sorted(
        (r["point_id"], r["meta"]) for r in plain.collect()
    )


def test_cell_histogram_and_salt_map(spark, points):
    hist = cell_histogram(points.withColumn("py", -F.col("py")), "px", "py", res=8)
    total = hist.agg(F.sum("count")).collect()[0][0]
    assert total == N
    salt = derive_salt_map(hist, target_rows_per_part=100)
    assert salt and all(v >= 2 for v in salt.values())


def test_knn_histogram_reuse_skips_sampled_pass(spark, points):
    # VERDICT r3 #8: a caller-maintained cell histogram replaces the
    # sampled density pass — same answer, and construction runs fewer
    # jobs on the point table (one tiny agg over occupied cells instead)
    rng = np.random.default_rng(7)
    qpts = [(int(i), int(x), -int(y))
            for i, (x, y) in enumerate(rng.integers(0, 1024, (10, 2)))]
    queries = spark.createDataFrame(qpts, schema="query_id long, qx long, qy long")
    hist = cell_histogram(points, "px", "py", res=5).cache()
    hist.count()  # materialize once, as a maintaining caller would

    sc = spark.sparkContext
    sc.setJobGroup("knn_sampled", "knn without histogram")
    base = knn_join(points, queries, k=5, res=5)
    sc.setJobGroup("knn_hist", "knn with cached histogram")
    reused = knn_join(points, queries, k=5, res=5, histogram=hist)
    sc.setJobGroup("knn_done", "")
    tracker = sc.statusTracker()
    n_sampled = len(tracker.getJobIdsForGroup("knn_sampled"))
    n_hist = len(tracker.getJobIdsForGroup("knn_hist"))
    # the histogram path must not add point-table jobs: strictly fewer
    # or equal construction jobs, and the sampled pass disappears
    assert n_hist <= n_sampled, (n_hist, n_sampled)
    got = sorted((r["query_id"], r["point_id"], r["dist_sq"])
                 for r in reused.collect())
    want = sorted((r["query_id"], r["point_id"], r["dist_sq"])
                  for r in base.collect())
    assert got == want
    hist.unpersist()


def test_point_in_tile_join_planetary_flip(spark, points):
    # VERDICT r4 #7: above the broadcast threshold the tile dim must NOT
    # be broadcast — the equi-join on the computed key shuffles instead
    from veranda_spark.grid import RegularGrid
    from veranda_spark.operators.joins import point_in_tile_join

    from pyspark.sql import functions as F

    small = RegularGrid(tile_cols=256, tile_rows=256,
                        n_tile_cols=16, n_tile_rows=8)
    big = RegularGrid(tile_cols=256, tile_rows=256,
                      n_tile_cols=2000, n_tile_rows=2000)  # 4M tiles
    # a big points side too, so Catalyst cannot sidestep by broadcasting
    # the probe side (which would be the RIGHT call for tiny points)
    big_points = spark.range(20_000_000).select(
        F.col("id").alias("point_id"),
        (F.col("id") * 7919 % (2000 * 256)).alias("px"),
        (F.col("id") * 104729 % (2000 * 256)).alias("py"),
    )

    plan_small = point_in_tile_join(
        points, small.tiles_df(spark), small
    )._jdf.queryExecution().executedPlan().toString()
    # dim-sized grid: the tile dim IS hint-broadcast (hash relation)
    assert "HashedRelationBroadcastMode" in plan_small

    plan_big = point_in_tile_join(
        big_points, big.tiles_df(spark), big
    )._jdf.queryExecution().executedPlan().toString()
    # planetary grid: NO hash-broadcast anywhere — the tile dim shuffles
    # (the only BroadcastExchange allowed is tiles_df's internal
    # IdentityBroadcastMode range cross-join that CONSTRUCTS the dim)
    assert "HashedRelationBroadcastMode" not in plan_big, plan_big
    assert ("SortMergeJoin" in plan_big) or ("ShuffledHashJoin" in plan_big)

    # explicit tile_count overrides the static bound: the broadcast HINT
    # disappears from the logical plan (Catalyst may still auto-broadcast
    # a dim its own stats prove tiny — that is the right call, so assert
    # at the hint level, not the physical level)
    forced = point_in_tile_join(
        big_points, small.tiles_df(spark), small, tile_count=10_000_000
    )._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in forced
    hinted = point_in_tile_join(
        big_points, small.tiles_df(spark), small
    )._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" in hinted

    # and the flipped join still computes the same assignments
    got = {
        (r["point_id"], r["tile_id"])
        for r in point_in_tile_join(
            points, small.tiles_df(spark), small, broadcast_threshold=1
        ).select("point_id", "tile_id").collect()
    }
    want = {
        (r["point_id"], r["tile_id"])
        for r in point_in_tile_join(
            points, small.tiles_df(spark), small
        ).select("point_id", "tile_id").collect()
    }
    assert got == want and len(got) > 0
