"""Spatial joins: point-in-polygon, point-in-tile, kNN, skew salting.

North-rule additions over the reference (SURVEY.md §2.3): veranda's only
join-shaped computations are register⋈mosaic tile pruning (J1),
polygon⋈tile intersection (J2, base.py:546-555) and point→tile lookup
(J3, base.py:471-477).  This module re-expresses them as real Spark joins
and adds what veranda lacks: kNN (ring expansion + distance re-rank) and
explicit skew handling (cell histogram → salted broadcast join).

All coordinates here are integer pixel coords (SURVEY.md §7 hard-part #1:
join on integers, never rounded floats); distances are exact integer
squared distances, ties broken by id — so results are reproducible in
ANSI SQL for the oracle.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from veranda_spark.cells import cell_id, pack_cell, ring_cells
from veranda_spark.functions.geometry import (
    is_ring_list_column,
    points_in_polygon,
    points_in_rings,
    segment_intersects_boxes,
    spec_to_rings,
)


# ---- point-in-polygon -------------------------------------------------------


def _polygon_cover_rows(
    polygons: dict[str, Sequence[tuple[float, float]]],
    res: int,
    to_px: callable,
) -> list[tuple[str, int, bool]]:
    """Driver-side cell cover of each polygon at resolution res (polygons
    are a small dimension — the H3 polyfill analog), CLASSIFIED per cell
    (round-9, guide §4 "eliminate the Python boundary" applied to the
    candidate volume):

    - a cell no polygon edge touches is uniformly inside or outside
      (the boundary cannot cross it) — decided by one center test:
      entirely-outside cells are DROPPED from the cover (their
      candidates were all UDF-rejected before), entirely-inside cells
      are emitted with ``full=True`` (their candidates are hits by
      construction and skip the exact re-check);
    - boundary cells (an edge touches the box) emit ``full=False`` and
      keep the exact ray-cast re-check.

    Exactness: the polygon→cell-frame map is an affine (reflection), so
    parity is preserved; boundary-degenerate center points cannot occur
    in edge-free cells.  The emitted (full ∪ partial) cover is exactly
    the polygon's touched cells, a subset of the old bbox cover — rows
    that only ever produced UDF-rejected candidates are gone."""
    size = 1 << res
    out = []
    from veranda_spark.cells import CELL_OFFSET

    for pid, poly in polygons.items():
        p = np.asarray(poly, dtype="float64")
        u, v = zip(*(to_px(x, y) for x, y in p))
        pp = np.stack([np.asarray(u, dtype="float64"),
                       np.asarray(v, dtype="float64")], axis=1)
        c0, c1 = pp[:, 0].min(), pp[:, 0].max()
        r0, r1 = pp[:, 1].min(), pp[:, 1].max()
        iys = range(int(np.floor(r0 / size)), int(np.floor(r1 / size)) + 1)
        ixs = range(int(np.floor(c0 / size)), int(np.floor(c1 / size)) + 1)
        xmin = np.array([ix * size for iy in iys for ix in ixs], dtype="float64")
        ymin = np.array([iy * size for iy in iys for ix in ixs], dtype="float64")
        xmax, ymax = xmin + size, ymin + size
        edge_hit = np.zeros(xmin.shape, dtype=bool)
        for i in range(len(pp)):
            ax, ay = pp[i]
            bx, by = pp[(i + 1) % len(pp)]
            edge_hit |= segment_intersects_boxes(
                ax, ay, bx, by, xmin, ymin, xmax, ymax
            )
        center_in = points_in_polygon(xmin + size / 2.0, ymin + size / 2.0, pp)
        for idx, (iy, ix) in enumerate(
            (iy, ix) for iy in iys for ix in ixs
        ):
            if not edge_hit[idx] and not center_in[idx]:
                continue  # entirely outside — no candidates worth making
            cell = (res << 58) + (iy + CELL_OFFSET) * (1 << 29) + (ix + CELL_OFFSET)
            out.append((pid, cell, bool(not edge_hit[idx])))
    return out


def pip_join(
    points: DataFrame,
    polygons: dict[str, Sequence[tuple[float, float]]],
    x_col: str = "px",
    y_col: str = "py",
    res: int = 6,
    how: str = "inner",
) -> DataFrame:
    """Point-in-polygon join (the north rule's core join; veranda analog:
    polygon select P7, base.py:510-557).

    Two-phase plan:
    1. coarse: broadcast equi-join of point cell keys against the
       polygons' cell covers (cheap, prunes almost everything);
    2. exact: vectorized ray-cast re-check inside an Arrow pandas UDF.

    ``points`` uses world coords equal to pixel coords here (grid with
    ul=0, ps=1); pass transformed columns otherwise.
    """
    from veranda_spark.session import local_df

    spark = points.sparkSession
    cover = _polygon_cover_rows(polygons, res, lambda x, y: (x, -y))
    # one-slice dim frame (see session.local_df: the default ~32 Python
    # slices cost ~1.5s of broadcast build for a few hundred rows)
    cover_df = local_df(
        spark, cover, "polygon_id string, cell long, full boolean"
    )
    pts = points.withColumn(
        "_cell", cell_id(F.col(x_col), -F.col(y_col), res)
    )
    cand = pts.join(F.broadcast(cover_df), pts["_cell"] == cover_df["cell"], "inner").drop(
        "cell", "_cell"
    )
    polys = {k: np.asarray(v, dtype="float64") for k, v in polygons.items()}

    # Exact re-check only where the boundary can reach (round-9, guide
    # §4): full-cell candidates are hits by construction and skip the
    # ray-cast inside the UDF; boundary-cell candidates — the ONLY rows
    # where a point can sit near/on an edge — keep the r1-r8 even-odd
    # ray-cast BIT-FOR-BIT, so edge-point behavior (the half-open
    # crossing convention) is exactly what it always was.  (A convex
    # all-same-sign Column predicate was tried here and reverted in
    # review: it excluded exactly-on-edge points the ray-cast admits.)
    @F.pandas_udf("boolean")
    def inside(
        px: pd.Series, py: pd.Series, pid: pd.Series, full: pd.Series
    ) -> pd.Series:
        out = full.to_numpy(dtype=bool).copy()
        todo = ~out
        xv, yv = px.to_numpy("float64"), py.to_numpy("float64")
        for p, poly in polys.items():
            m = todo & (pid == p).to_numpy()
            if m.any():
                out[m] = points_in_polygon(xv[m], yv[m], poly)
        return pd.Series(out)

    hits = cand.filter(
        inside(F.col(x_col), F.col(y_col), F.col("polygon_id"), F.col("full"))
    ).drop("full")
    if how == "inner":
        return hits
    if how == "left":
        return points.join(
            hits.select(*points.columns, "polygon_id"), points.columns, "left"
        )
    raise ValueError(f"how={how!r}")


def pip_join_table(
    points: DataFrame,
    polygons: DataFrame,
    x_col: str = "px",
    y_col: str = "py",
    poly_id: str = "polygon_id",
    xy_col: str = "xy",
    res: int = 6,
    broadcast_cover: bool = True,
) -> DataFrame:
    """Point-in-polygon join against a polygon TABLE (round-2 addition:
    the dict-based ``pip_join`` caps the polygon side at task-closure
    size; this variant scales to millions of zones).

    ``polygons`` carries (poly_id, xy_col: array<array<double>>) with
    vertices in the SAME planar frame as (x_col, y_col).  Plan:

    1. per-polygon bbox + cell cover computed JVM-side (array_min/max +
       sequence explode — no driver loop, no Python);
    2. candidate equi-join on the cell key (broadcast when the cover side
       is dim-sized, shuffle hash otherwise — set broadcast_cover=False
       for huge polygon tables and let AQE pick);
    3. exact ray-cast re-check in an Arrow pandas UDF, vectorized over
       the points of each polygon within the batch.

    Reference analog: slice_by_geom over arbitrary OGR geometry
    (base.py:538-555) — here as a relational join instead of a per-file
    loop.

    ``xy_col`` is one ring (array<array<double>>) or a ring LIST (holes /
    multipolygons, even-odd) — detected from the column's nesting depth."""
    size = 1 << res
    multi_ring = is_ring_list_column(polygons, xy_col)
    flat_xy = F.flatten(F.col(xy_col)) if multi_ring else F.col(xy_col)
    xs = F.transform(flat_xy, lambda v: F.element_at(v, 1))
    ys = F.transform(flat_xy, lambda v: F.element_at(v, 2))
    ix0 = F.floor(F.array_min(xs) / F.lit(size)).cast("long")
    ix1 = F.floor(F.array_max(xs) / F.lit(size)).cast("long")
    iy0 = F.floor(F.array_min(ys) / F.lit(size)).cast("long")
    iy1 = F.floor(F.array_max(ys) / F.lit(size)).cast("long")
    cover = polygons.select(
        F.col(poly_id),
        F.col(xy_col),
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(iy0, iy1),
                    lambda iy: F.transform(
                        F.sequence(ix0, ix1), lambda ix: pack_cell(ix, iy, res)
                    ),
                )
            )
        ).alias("_cell"),
    )
    if broadcast_cover:
        cover = F.broadcast(cover)
    pts = points.withColumn("_cell", cell_id(F.col(x_col), F.col(y_col), res))
    cand = pts.join(cover, "_cell").drop("_cell")

    @F.pandas_udf("boolean")
    def inside_t(px: pd.Series, py: pd.Series, pid: pd.Series, xy: pd.Series) -> pd.Series:
        out = np.zeros(len(px), dtype=bool)
        xv, yv = px.to_numpy("float64"), py.to_numpy("float64")
        for p in pid.unique():
            m = (pid == p).to_numpy()
            first = int(np.flatnonzero(m)[0])
            spec = xy.iloc[first]
            rings = spec_to_rings(spec, multi_ring)
            if multi_ring:
                out[m] = points_in_rings(xv[m], yv[m], rings)
            else:
                out[m] = points_in_polygon(xv[m], yv[m], rings[0])
        return pd.Series(out)

    return cand.filter(
        inside_t(F.col(x_col), F.col(y_col), F.col(poly_id), F.col(xy_col))
    ).drop(xy_col)


# ---- point -> tile lookup (J1/J3) ------------------------------------------


def point_in_tile_join(
    points: DataFrame,
    tiles: DataFrame,
    grid,
    x_col: str = "px",
    y_col: str = "py",
    broadcast_threshold: int = 1_000_000,
    tile_count: int | None = None,
) -> DataFrame:
    """J3 (xy2tile, base.py:471-477) as an equi join against the tile
    dimension: the point's tile key is COMPUTED (tile_of_xy), never
    searched, so the join stays a key equi-join at any scale.

    The tile dim is broadcast only while it is dim-sized.  On a
    planetary grid (millions of tiles — PLANS.md flagged this flip),
    broadcasting would ship a multi-GB dim to every executor; above
    ``broadcast_threshold`` tiles the hint is dropped automatically and
    the join shuffle-partitions on the computed key (AQE may still pick
    a better physical strategy from real sizes).  The count comes from
    the grid's static bounds (``n_tile_rows × n_tile_cols``) or an
    explicit ``tile_count``; an unbounded grid without a count keeps the
    dim-sized default."""
    keyed = points.withColumn(
        "tile_id", grid.tile_of_xy(F.col(x_col), F.col(y_col))
    )
    if tile_count is None and grid.n_tile_rows > 0 and grid.n_tile_cols > 0:
        tile_count = grid.n_tile_rows * grid.n_tile_cols
    big_dim = tile_count is not None and tile_count > broadcast_threshold
    return keyed.join(tiles if big_dim else F.broadcast(tiles), "tile_id", "inner")


# ---- kNN by ring expansion --------------------------------------------------


def knn_join(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    res: int = 6,
    point_id: str = "point_id",
    px: str = "px",
    py: str = "py",
    query_id: str = "query_id",
    qx: str = "qx",
    qy: str = "qy",
    max_rounds: int = 4,
    per_cell_hint: float | None = None,
    hist_sample: int = 16,
    histogram: DataFrame | None = None,
) -> DataFrame:
    """k-nearest-neighbors of each query point (north-rule addition; no
    reference analog — SURVEY.md §2.3 J3 note).

    Plan: iterative cell-ring expansion.  Round i broadcast-joins the
    (small) query set, exploded over its Chebyshev ring of radius r_i, to
    the (big) point set on the cell key — the big side never shuffles.
    A query is satisfied once its k-th candidate lies within the
    guaranteed-covered radius r_i·cellsize (no closer point can hide
    outside the ring).  Unsatisfied queries escalate; stragglers fall back
    to a brute-force broadcast NL join.

    Distances are exact integer squared distances; ties break on point id
    so output is deterministic and oracle-reproducible.
    """
    size = 1 << res
    pts = points.select(
        F.col(point_id).alias("_pid"),
        F.col(px).cast("long").alias("_px"),
        F.col(py).cast("long").alias("_py"),
    ).withColumn("_pcell", cell_id(F.col("_px"), F.col("_py"), res))
    qs = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(qx).cast("long").alias("_qx"),
        F.col(qy).cast("long").alias("_qy"),
    )

    remaining = qs
    results: DataFrame | None = None
    # adaptive initial radius from the CELL HISTOGRAM (round-2: the bbox
    # average under-estimates density on hotspot-skewed data — a huge
    # near-empty bbox drives a needlessly large first ring).  The median
    # occupied-cell count is robust to both skew and empty space; the
    # guard radius + brute-force fallback keep correctness independent of
    # the estimate.  Round-3: the estimate no longer costs a full pass —
    # callers with a maintained histogram pass per_cell_hint (median rows
    # per occupied cell); otherwise a deterministic 1-in-hist_sample hash
    # sample of the point table is histogrammed and scaled back up;
    # round-4 callers can instead pass histogram=cell_histogram(points,..)
    # (same res) so the estimate is one agg over occupied cells — no
    # point-table rescan on repeated kNN calls.  A
    # wrong estimate only moves work between rounds, never the answer.
    import math

    per_cell = per_cell_hint
    if per_cell is None and histogram is not None:
        # round-4 (VERDICT r3 #8): a caller-maintained cell_histogram()
        # frame (columns cell,count — same res!) replaces the sampled
        # pass: the median comes from ONE tiny agg over occupied cells
        # (cache the histogram and repeated kNN calls never rescan the
        # point table for density estimation)
        stats = histogram.agg(
            F.count("*").alias("n_cells"),
            F.percentile_approx("count", 0.5).alias("p50"),
        ).collect()[0]
        if stats["n_cells"]:
            per_cell = float(stats["p50"])
    if per_cell is None:
        spts = pts
        scale = 1
        if hist_sample > 1:
            spts = pts.filter(
                F.pmod(F.xxhash64("_pid"), F.lit(hist_sample)) == 0
            )
            scale = hist_sample
        stats = spts.groupBy("_pcell").count().agg(
            F.count("*").alias("n_cells"),
            F.percentile_approx("count", 0.5).alias("p50"),
        ).collect()[0]
        if stats["n_cells"]:
            per_cell = float(stats["p50"]) * scale
    if per_cell is not None and per_cell > 0:
        # ring of radius r covers (2r+1)^2 cells; aim for ~3k candidates
        r = max(1, int(math.ceil((math.sqrt(3.0 * k / per_cell) - 1) / 2)))
        r = min(r, 64)
    else:
        r = 1
    for _ in range(max_rounds):
        ring = remaining.withColumn(
            "_cell", F.explode(ring_cells(cell_id(F.col("_qx"), F.col("_qy"), res), r, res))
        )
        cand = pts.join(F.broadcast(ring), pts["_pcell"] == ring["_cell"], "inner")
        dx = F.col("_px") - F.col("_qx")
        dy = F.col("_py") - F.col("_qy")
        cand = cand.withColumn("_d2", dx * dx + dy * dy)  # exact integer distance
        w = Window.partitionBy("_qid").orderBy(F.col("_d2").asc(), F.col("_pid").asc())
        # localCheckpoint the (tiny: ≤ k rows/query) ranked frame — the
        # round's convergence probe (take(1) on the anti-join), the
        # sat_ids agg AND the caller's final action all read it, so
        # without the materialization the big candidate join + window
        # executes up to three times per round (round-9, guide §1/§2.4)
        ranked = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .localCheckpoint(eager=True)
        )
        # satisfied: k candidates AND kth distance within guaranteed radius
        guard = (r * size) ** 2
        sat_ids = (
            ranked.groupBy("_qid")
            .agg(F.count("*").alias("_n"), F.max("_d2").alias("_dk"))
            .filter((F.col("_n") == k) & (F.col("_dk") <= guard))
            .select("_qid")
        )
        done = ranked.join(sat_ids, "_qid", "left_semi")
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(sat_ids, "_qid", "left_anti")
        if not remaining.take(1):
            remaining = None
            break
        r *= 4
    if remaining is not None and remaining.take(1):
        # brute force for stragglers (tiny query side → broadcast NL join)
        cand = pts.crossJoin(F.broadcast(remaining))
        dx = F.col("_px") - F.col("_qx")
        dy = F.col("_py") - F.col("_qy")
        cand = cand.withColumn("_d2", dx * dx + dy * dy)
        w = Window.partitionBy("_qid").orderBy(F.col("_d2").asc(), F.col("_pid").asc())
        brute = cand.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
        results = brute if results is None else results.unionByName(brute)
    return results.select(
        F.col("_qid").alias(query_id),
        F.col("_pid").alias(point_id),
        F.col("_d2").alias("dist_sq"),
        F.col("_rn").alias("knn_rank"),
    )


# ---- skew handling ----------------------------------------------------------


def cell_histogram(df: DataFrame, x_col: str, y_col: str, res: int) -> DataFrame:
    """Per-cell row counts — the skew diagnostic the salt map derives from
    (BASELINE.json north_rule: 'adaptive repartitioning keyed on H3 cell
    histograms')."""
    return (
        df.withColumn("cell", cell_id(F.col(x_col), F.col(y_col), res))
        .groupBy("cell")
        .count()
    )


def derive_salt_map(hist: DataFrame, target_rows_per_part: int = 100_000) -> dict[int, int]:
    """cell → salt fan-out for cells whose count exceeds the target
    (collected to the driver: the histogram of HOT cells is tiny)."""
    hot = hist.filter(F.col("count") > target_rows_per_part).collect()
    return {int(r["cell"]): int(np.ceil(r["count"] / target_rows_per_part)) for r in hot}


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_map: dict[int, int] | None = None,
    default_salt: int = 1,
    how: str = "inner",
) -> DataFrame:
    """Equi join resilient to hot keys: the big side gets a per-row salt in
    [0, n_key) (n from the salt map, 1 for cold keys); the small side is
    exploded over every salt value.  With a broadcast small side Spark
    never shuffles the big side at all; the salt also protects downstream
    groupBys on (key, salt).

    Only inner/left are supported: with right/full outer the exploded
    small side would surface one unmatched row PER SALT VALUE.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_broadcast_join supports inner/left, got {how!r}")
    spark = big.sparkSession
    if salt_map:
        from veranda_spark.session import local_df

        entries = [(int(c), int(n)) for c, n in salt_map.items()]
        sm = F.broadcast(local_df(spark, entries, f"{key} long, _nsalt int"))
        big = big.join(sm, key, "left").withColumn(
            "_nsalt", F.coalesce(F.col("_nsalt"), F.lit(default_salt))
        )
        small = small.join(sm, key, "left").withColumn(
            "_nsalt", F.coalesce(F.col("_nsalt"), F.lit(default_salt))
        )
    else:
        big = big.withColumn("_nsalt", F.lit(default_salt))
        small = small.withColumn("_nsalt", F.lit(default_salt))
    big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns if c not in ("_nsalt",)]), F.col("_nsalt")).cast("int")
    ).drop("_nsalt")
    small = (
        small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.col("_nsalt") - 1)))
        .withColumn("_salt", F.col("_salt").cast("int"))
        .drop("_nsalt")
    )
    out = big.join(F.broadcast(small), [key, "_salt"], how)
    return out.drop("_salt")
