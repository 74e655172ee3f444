"""pip_join_table: polygon side as a DataFrame (scales past task-closure
size), verified against a driver-side brute force over 10k polygons."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from veranda_spark.functions.geometry import points_in_polygon
from veranda_spark.operators.joins import pip_join_table

N_POLY = 10_000
N_PTS = 2_000
WORLD = 4096


def _triangles(n):
    """Deterministic triangles; +0.5 offsets keep integer points off edges."""
    out = []
    for i in range(n):
        cx = (i * 997) % WORLD + 0.5
        cy = (i * 613) % WORLD + 0.5
        r = 8.0 + (i % 5) * 6.0
        out.append(
            (
                f"p{i:05d}",
                [[cx, cy - r], [cx + r, cy + r], [cx - r, cy + r]],
            )
        )
    return out


def _points(n):
    return [(j, (j * 7919) % WORLD, (j * 104729) % WORLD) for j in range(n)]


@pytest.mark.parametrize("broadcast_cover", [True, False])
def test_pip_table_matches_brute_force(spark, broadcast_cover):
    polys = _triangles(N_POLY)
    pts = _points(N_PTS)
    pdf = spark.createDataFrame(polys, "polygon_id string, xy array<array<double>>")
    tdf = spark.createDataFrame(pts, "point_id long, px long, py long")
    got = {
        (r["point_id"], r["polygon_id"])
        for r in pip_join_table(
            tdf, pdf, res=5, broadcast_cover=broadcast_cover
        ).collect()
    }
    # brute force: vectorize points per polygon
    px = np.array([p[1] for p in pts], dtype="float64")
    py = np.array([p[2] for p in pts], dtype="float64")
    ids = np.array([p[0] for p in pts])
    want = set()
    for pid, xy in polys:
        inside = points_in_polygon(px, py, np.asarray(xy))
        for j in ids[inside]:
            want.add((int(j), pid))
    assert got == want
    assert len(want) > 0  # fixture sanity: some hits exist


def test_pip_table_plan_broadcasts_cover(spark):
    pdf = spark.createDataFrame(_triangles(100), "polygon_id string, xy array<array<double>>")
    tdf = spark.createDataFrame(_points(100), "point_id long, px long, py long")
    plan = (
        pip_join_table(tdf, pdf, res=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pip_table_accepts_rings(spark):
    # donut: outer square with a hole; even-odd excludes hole points
    outer = [[100.0, 100.0], [900.0, 100.0], [900.0, 900.0], [100.0, 900.0]]
    hole = [[400.0, 400.0], [600.0, 400.0], [600.0, 600.0], [400.0, 400.0 + 200.0]]
    pdf = spark.createDataFrame(
        [("donut", [outer, hole])],
        "polygon_id string, xy array<array<array<double>>>",
    )
    pts = spark.createDataFrame(
        [(1, 200.5, 200.5), (2, 500.5, 500.5), (3, 950.5, 950.5), (4, 650.5, 500.5)],
        "point_id long, px double, py double",
    )
    got = {r["point_id"] for r in pip_join_table(pts, pdf).collect()}
    assert got == {1, 4}  # 2 is in the hole, 3 is outside
