"""temporal_stats: per-pixel reductions over a layer stack vs numpy
goldens — the sig0 time-series datacube workload (reference mosaic
stacks; xarray mean('time')/polyfit idioms)."""

import numpy as np
import pytest

from veranda_spark.operators.cube import temporal_stats


def _stack_df(spark, stacks, nodata=-9999.0):
    # stacks: {tile_id: [(layer_id, arr), ...]}
    rows = []
    for tid, layers in stacks.items():
        tr, tc = (int(s) for s in tid.split("_"))
        for lid, arr in layers:
            rows.append(
                (tid, tr, tc, "data", lid, arr.tobytes(),
                 arr.shape[0], arr.shape[1], 1, str(arr.dtype), 1)
            )
    return spark.createDataFrame(
        rows,
        "tile_id string, tile_row long, tile_col long, var string, "
        "layer_id int, bytes binary, h int, w int, channels int, "
        "dtype string, n_images long",
    )


def _canvases(df):
    return {
        (r["tile_id"], r["stat"]):
            np.frombuffer(r["bytes"], dtype=r["dtype"]).reshape(r["h"], r["w"])
        for r in df.collect()
    }


def test_temporal_stats_matches_numpy_golden(spark):
    rng = np.random.default_rng(7)
    nod = -9999.0
    stacks = {}
    raw = {}
    for tid in ("0_0", "1_2"):
        layers = []
        for lid in range(1, 6):
            a = rng.uniform(-50, 50, (8, 10))
            # punch nodata holes (stored exactly)
            holes = rng.random((8, 10)) < 0.25
            a[holes] = nod
            layers.append((lid, a.astype("float64")))
        stacks[tid] = layers
        raw[tid] = layers
    out = temporal_stats(_stack_df(spark, stacks), nodata=nod)
    got = _canvases(out)
    for tid, layers in raw.items():
        stack = np.stack([a for _, a in layers])
        ts = np.array([float(l) for l, _ in layers])
        m = stack != nod
        n = m.sum(0)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.where(n > 0, np.where(m, stack, 0).sum(0) / n, nod)
            ev2 = np.where(m, stack**2, 0).sum(0)
            std = np.where(
                n > 0, np.sqrt(np.maximum(ev2 / np.maximum(n, 1)
                                          - np.where(n > 0, mean, 0) ** 2, 0)),
                nod,
            )
            st = (np.where(m, ts[:, None, None], 0)).sum(0)
            stt = (np.where(m, ts[:, None, None] ** 2, 0)).sum(0)
            stv = (np.where(m, ts[:, None, None] * stack, 0)).sum(0)
            sv = np.where(m, stack, 0).sum(0)
            den = n * stt - st * st
            ok = (n >= 2) & (np.abs(den) > 1e-12)
            slope = np.where(ok, (n * stv - st * sv) / np.where(ok, den, 1), nod)
        np.testing.assert_allclose(got[(tid, "mean")], mean, rtol=1e-12)
        np.testing.assert_allclose(got[(tid, "std")], std, rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(got[(tid, "count")], n.astype(float))
        np.testing.assert_allclose(got[(tid, "slope")], slope, rtol=1e-9, atol=1e-9)
        mn = np.where(n > 0, np.where(m, stack, np.inf).min(0), nod)
        mx = np.where(n > 0, np.where(m, stack, -np.inf).max(0), nod)
        np.testing.assert_allclose(got[(tid, "min")], mn)
        np.testing.assert_allclose(got[(tid, "max")], mx)


def test_temporal_slope_exact_on_linear_ramp(spark):
    # value(t) = 3t + b per pixel → slope EXACTLY 3 everywhere; a pixel
    # with a single valid observation gets nodata slope
    nod = -9999.0
    b = np.arange(48, dtype="float64").reshape(6, 8)
    layers = []
    for t in (2, 5, 9):
        a = 3.0 * t + b
        layers.append((t, a))
    # pixel (0,0): valid only at t=2
    layers = [(t, a.copy()) for t, a in layers]
    layers[1][1][0, 0] = nod
    layers[2][1][0, 0] = nod
    out = temporal_stats(_stack_df(spark, {"0_0": layers}), nodata=nod)
    got = _canvases(out)
    slope = got[("0_0", "slope")]
    assert slope[0, 0] == nod
    rest = np.ones_like(slope) * 3.0
    rest[0, 0] = nod
    np.testing.assert_allclose(slope, rest, rtol=1e-12)
    # custom time column: scaling time by 10 scales slope down by 10
    df = _stack_df(spark, {"0_0": layers}).withColumn(
        "t_days", (10.0 * __import__("pyspark.sql.functions", fromlist=["col"]).col("layer_id"))
    )
    out2 = temporal_stats(df, stats=("slope",), nodata=nod, time_col="t_days")
    slope2 = _canvases(out2)[("0_0", "slope")]
    np.testing.assert_allclose(slope2[1:], rest[1:] / 10.0, rtol=1e-12)


def test_temporal_stats_guards(spark):
    nod = -9999.0
    a = np.zeros((4, 4))
    df = _stack_df(spark, {"0_0": [(1, a)]}, nodata=nod)
    with pytest.raises(ValueError, match="unknown stats"):
        temporal_stats(df, stats=("median",))
    # misaligned stack raises
    rows = df.union(_stack_df(spark, {"0_0": [(2, np.zeros((5, 4)))]}))
    with pytest.raises(Exception, match="misaligned stack"):
        temporal_stats(rows).collect()
