"""P7 exact-recheck completeness: sliver polygons that cross a footprint
without containing any footprint corner and without any vertex inside the
footprint (reference slice_by_geom keeps such tiles, base.py:546-555).
Round-1 verdict flagged these as false negatives."""

import numpy as np
import pytest

from veranda_spark.functions.geometry import segment_intersects_boxes
from veranda_spark.grid import RegularGrid
from veranda_spark.operators.select import select_polygon

GRID = RegularGrid(ul_x=0.0, ul_y=0.0, psx=1.0, psy=1.0, tile_cols=10, tile_rows=10)


def test_segment_box_kernel_known_cases():
    xmin = np.array([10.0, 10.0, 10.0])
    ymin = np.array([-20.0, -20.0, -20.0])
    xmax = np.array([20.0, 20.0, 20.0])
    ymax = np.array([-10.0, -10.0, -10.0])
    # horizontal cut through, fully inside, fully outside (above)
    assert segment_intersects_boxes(0, -15, 30, -15, xmin, ymin, xmax, ymax).all()
    got = segment_intersects_boxes(12, -12, 18, -18, xmin, ymin, xmax, ymax)
    assert got.all()  # segment wholly inside the box still intersects
    assert not segment_intersects_boxes(0, -5, 30, -5, xmin, ymin, xmax, ymax).any()
    # diagonal clipping only a corner region
    assert segment_intersects_boxes(19, -9, 21, -11, xmin, ymin, xmax, ymax).all()
    # vertical segment left of box
    assert not segment_intersects_boxes(9, -5, 9, -25, xmin, ymin, xmax, ymax).any()


def test_segment_box_kernel_vs_sampling():
    rng = np.random.default_rng(7)
    n = 400
    xmin = rng.uniform(0, 50, n)
    ymin = rng.uniform(-50, 0, n) - 5
    xmax = xmin + rng.uniform(1, 10, n)
    ymax = ymin + rng.uniform(1, 10, n)
    for _ in range(50):
        ax, bx = rng.uniform(-10, 70, 2)
        ay, by = rng.uniform(-70, 10, 2)
        got = segment_intersects_boxes(ax, ay, bx, by, xmin, ymin, xmax, ymax)
        t = np.linspace(0, 1, 2001)[:, None]
        sx = ax + t * (bx - ax)
        sy = ay + t * (by - ay)
        sampled = (
            (sx >= xmin) & (sx <= xmax) & (sy >= ymin) & (sy <= ymax)
        ).any(axis=0)
        # sampling can miss grazing hits but never invents one
        assert not (sampled & ~got).any()


@pytest.mark.parametrize(
    "poly",
    [
        # thin horizontal sliver crossing the box; vertices outside, no box
        # corner or center inside the sliver
        [(0.0, -12.3), (30.0, -12.3), (30.0, -12.8), (0.0, -12.8)],
        # thin diagonal sliver cutting one corner region of the box
        [(18.5, -8.0), (22.0, -11.5), (21.5, -12.0), (18.0, -8.5)],
    ],
)
def test_select_polygon_keeps_sliver_crossed_footprints(spark, poly):
    reg = spark.createDataFrame(
        [(10, 10, 10, 10, "keep"), (40, 40, 10, 10, "drop")],
        "px_col0 long, px_row0 long, w long, h long, name string",
    )
    got = {r["name"] for r in select_polygon(reg, GRID, poly).collect()}
    assert got == {"keep"}


def test_select_multipolygon_donut_and_disjoint(spark):
    from veranda_spark.operators.select import select_multipolygon

    reg = spark.createDataFrame(
        [
            (12, 12, 4, 4, "in_hole"),      # box inside the hole -> dropped
            (1, 1, 4, 4, "in_band"),        # box in the filled band -> kept
            (40, 40, 5, 5, "in_part2"),     # inside the disjoint triangle
            (60, 60, 4, 4, "outside"),
        ],
        "px_col0 long, px_row0 long, w long, h long, name string",
    )
    outer = [(0.25, -0.25), (20.25, -0.25), (20.25, -20.25), (0.25, -20.25)]
    hole = [(10.25, -10.25), (18.25, -10.25), (18.25, -18.25), (10.25, -18.25)]
    tri2 = [(38.25, -38.25), (50.25, -38.25), (44.25, -50.25)]
    got = {
        r["name"]
        for r in select_multipolygon(reg, GRID, [outer, hole, tri2]).collect()
    }
    assert got == {"in_band", "in_part2"}


def test_rings_pixel_mask_even_odd():
    from veranda_spark.functions.geometry import polygon_pixel_mask, rings_pixel_mask

    outer = [(0.25, -0.25), (20.25, -0.25), (20.25, -20.25), (0.25, -20.25)]
    hole = [(5.25, -5.25), (15.25, -5.25), (15.25, -15.25), (5.25, -15.25)]
    m = rings_pixel_mask([outer, hole], 0, 0, 1, 1, 0, 0, 24, 24)
    mo = polygon_pixel_mask(np.asarray(outer), 0, 0, 1, 1, 0, 0, 24, 24)
    mh = polygon_pixel_mask(np.asarray(hole), 0, 0, 1, 1, 0, 0, 24, 24)
    assert (m == (mo & ~mh)).all()
    assert m.any() and not m[10, 10]  # hole center masked out


def test_zip_payload_decode():
    import io
    import zipfile

    from veranda_spark.functions.codec import decode_image, png_encode

    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("img.png", png_encode(arr))
    np.testing.assert_array_equal(
        decode_image(buf.getvalue(), "zip", 8, 8), arr
    )
