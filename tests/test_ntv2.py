"""NTv2 grid-shift datum tests.

The reference reaches grid-based datum shifts through GDAL/osr (PROJ
loads .gsb grids); this engine reads/writes the NTv2 container itself
(veranda_spark/functions/ntv2.py).  No real national grid ships in the
sandbox, so correctness is pinned by construction: bilinear
interpolation reproduces an AFFINE shift field exactly, write∘read is
the identity in both endiannesses, sub-grid precedence and coverage
semantics match the spec, and the Spark Column path equals numpy.
"""

import numpy as np
import pytest

from veranda_spark.functions.ntv2 import (
    ntv2_shift_np, read_ntv2, write_ntv2,
)


def _affine_grid(tmp_path, name="ntv2.gsb", little=True, acc=False):
    """One sub-grid over lon[-10,10] lat[40,50], 0.5° spacing, with
    shifts AFFINE in (lon, lat) — bilinear interpolation reproduces an
    affine field exactly, so any interior probe has a closed form."""
    lon_min, lon_max, s_lat, n_lat, inc = -10.0, 10.0, 40.0, 50.0, 0.5
    lons = np.arange(lon_min, lon_max + inc / 2, inc)
    lats = np.arange(s_lat, n_lat + inc / 2, inc)
    LON, LAT = np.meshgrid(lons, lats)  # (nrows, ncols), row 0 south
    lat_shift = 1.25 + 0.30 * (LON - lon_min) + 0.15 * (LAT - s_lat)
    lon_shift = -2.50 + 0.20 * (LON - lon_min) - 0.10 * (LAT - s_lat)
    g = {"name": "MAIN", "s_lat": s_lat, "n_lat": n_lat, "lat_inc": inc,
         "lon_min": lon_min, "lon_max": lon_max, "lon_inc": inc,
         "lat_shift": lat_shift, "lon_shift": lon_shift}
    if acc:
        g["lat_acc"] = np.full_like(lat_shift, 0.01)
        g["lon_acc"] = np.full_like(lon_shift, 0.02)
    path = str(tmp_path / name)
    write_ntv2(path, [g], system_f="NAD27", system_t="NAD83",
               little_endian=little)
    return path, g


def _expect_shift(lon, lat):
    dlat = (1.25 + 0.30 * (lon + 10.0) + 0.15 * (lat - 40.0)) / 3600.0
    dlon = (-2.50 + 0.20 * (lon + 10.0) - 0.10 * (lat - 40.0)) / 3600.0
    return dlon, dlat


def test_write_read_roundtrip_both_endian(tmp_path):
    for little in (True, False):
        path, g = _affine_grid(tmp_path, f"e{little}.gsb", little, acc=True)
        back = read_ntv2(path)
        assert back["system_f"] == "NAD27" and back["system_t"] == "NAD83"
        assert len(back["sub_grids"]) == 1
        b = back["sub_grids"][0]
        assert b["name"] == "MAIN" and b["parent"] == "NONE"
        for k in ("s_lat", "n_lat", "lon_min", "lon_max", "lat_inc",
                  "lon_inc"):
            assert abs(b[k] - g[k]) < 1e-12, k
        # planes survive modulo float32 node storage
        np.testing.assert_allclose(b["lat_shift"], g["lat_shift"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(b["lon_shift"], g["lon_shift"],
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(b["lat_acc"], 0.01, rtol=1e-6)
        np.testing.assert_allclose(b["lon_acc"], 0.02, rtol=1e-6)


def test_bilinear_matches_affine_field_exactly(tmp_path):
    path, _ = _affine_grid(tmp_path)
    grid = read_ntv2(path)
    rng = np.random.default_rng(70)
    lon = rng.uniform(-10, 10, 2000)
    lat = rng.uniform(40, 50, 2000)
    out_lon, out_lat = ntv2_shift_np(grid, lon, lat)
    dlon, dlat = _expect_shift(lon, lat)
    # float32 node storage bounds the error at ~1e-7 arcsec relative
    np.testing.assert_allclose(out_lon, lon + dlon, rtol=0, atol=1e-9)
    np.testing.assert_allclose(out_lat, lat + dlat, rtol=0, atol=1e-9)
    # grid corners and edges hit node values exactly (edge clip path)
    for LO, LA in [(-10.0, 40.0), (10.0, 50.0), (10.0, 40.0),
                   (-10.0, 50.0), (0.0, 50.0), (10.0, 45.25)]:
        ol, oa = ntv2_shift_np(grid, LO, LA)
        el, ea = _expect_shift(np.array([LO]), np.array([LA]))
        assert abs(ol[0] - (LO + el[0])) < 1e-9
        assert abs(oa[0] - (LA + ea[0])) < 1e-9


def test_inverse_closes_and_outside_semantics(tmp_path):
    path, _ = _affine_grid(tmp_path)
    grid = read_ntv2(path)
    rng = np.random.default_rng(71)
    lon = rng.uniform(-9.9, 9.9, 500)
    lat = rng.uniform(40.1, 49.9, 500)
    flon, flat = ntv2_shift_np(grid, lon, lat)
    blon, blat = ntv2_shift_np(grid, flon, flat, inverse=True)
    np.testing.assert_allclose(blon, lon, atol=1e-9)
    np.testing.assert_allclose(blat, lat, atol=1e-9)
    # outside coverage: identity by default, ValueError when strict
    out_lon, out_lat = ntv2_shift_np(grid, np.array([120.0]),
                                     np.array([45.0]))
    assert out_lon[0] == 120.0 and out_lat[0] == 45.0
    with pytest.raises(ValueError, match="does not cover"):
        ntv2_shift_np(grid, np.array([120.0]), np.array([45.0]),
                      strict=True)


def test_subgrid_precedence_densest_wins(tmp_path):
    const = lambda rows, cols, v: np.full((rows, cols), v)
    parent = {"name": "PARENT", "s_lat": 0.0, "n_lat": 10.0,
              "lat_inc": 1.0, "lon_min": 0.0, "lon_max": 10.0,
              "lon_inc": 1.0, "lat_shift": const(11, 11, 3600.0 * 0.5),
              "lon_shift": const(11, 11, 0.0)}
    child = {"name": "CHILD", "parent": "PARENT", "s_lat": 4.0,
             "n_lat": 6.0, "lat_inc": 0.25, "lon_min": 4.0,
             "lon_max": 6.0, "lon_inc": 0.25,
             "lat_shift": const(9, 9, 3600.0 * 2.0),
             "lon_shift": const(9, 9, 3600.0 * 1.0)}
    path = str(tmp_path / "nested.gsb")
    write_ntv2(path, [parent, child])
    grid = read_ntv2(path)
    assert len(grid["sub_grids"]) == 2
    lon = np.array([1.0, 5.0])
    lat = np.array([1.0, 5.0])
    olon, olat = ntv2_shift_np(grid, lon, lat)
    assert abs(olat[0] - 1.5) < 1e-9 and abs(olon[0] - 1.0) < 1e-9
    assert abs(olat[1] - 7.0) < 1e-9 and abs(olon[1] - 6.0) < 1e-9


def test_malformed_files_raise(tmp_path):
    bad = tmp_path / "bad.gsb"
    bad.write_bytes(b"not an ntv2 file at all, padded to length....." * 8)
    with pytest.raises(ValueError, match="bad magic"):
        read_ntv2(str(bad))
    path, _ = _affine_grid(tmp_path)
    data = bytearray(open(path, "rb").read())
    # corrupt the GS_COUNT record of the first sub-grid (record 11 of
    # the sub header = bytes [16*11 + 16*10, …) value slot)
    off = 16 * 11 + 16 * 10 + 8
    data[off:off + 4] = (99).to_bytes(4, "little")
    trunc = tmp_path / "trunc.gsb"
    trunc.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="GS_COUNT"):
        read_ntv2(str(trunc))


GEOGCS_NAD27ISH = (
    'GEOGCS["NAD27-ish",DATUM["Test_1927",'
    'SPHEROID["Clarke 1866",6378206.4,294.978698213898]],'
    'PRIMEM["Greenwich",0],UNIT["degree",0.0174532925199433]{ext}]'
)


def test_transform_integration_suffix_and_wkt_extension(tmp_path):
    from veranda_spark.functions.crs import NP, parse_sref, transform

    path, _ = _affine_grid(tmp_path)
    src = GEOGCS_NAD27ISH.format(ext="") + "|NTV2:" + path
    p = parse_sref(src)
    assert p["ntv2"] == path and p["kind"] == "lonlat"

    rng = np.random.default_rng(72)
    lon = rng.uniform(-9, 9, 200)
    lat = rng.uniform(41, 49, 200)
    # datum-shifted source → Web Mercator == manual shift then webmerc
    x, y = transform(NP, src, "EPSG:3857", lon, lat)
    dlon, dlat = _expect_shift(lon, lat)
    ex, ey = transform(NP, "EPSG:4326", "EPSG:3857", lon + dlon, lat + dlat)
    # float32 node storage → shifts good to ~5e-7 arcsec → ~1e-5 m
    np.testing.assert_allclose(x, ex, rtol=0, atol=1e-4)
    np.testing.assert_allclose(y, ey, rtol=0, atol=1e-4)
    # and the reverse direction applies the grid INVERSE
    blon, blat = transform(NP, "EPSG:3857", src, ex, ey)
    np.testing.assert_allclose(blon, lon, atol=1e-8)
    np.testing.assert_allclose(blat, lat, atol=1e-8)

    # the GDAL WKT EXTENSION["PROJ4_GRIDS"] spelling parses identically
    wkt = GEOGCS_NAD27ISH.format(
        ext=f',EXTENSION["PROJ4_GRIDS","{path}"]')
    p2 = parse_sref(wkt)
    assert p2["ntv2"] == path
    x2, y2 = transform(NP, wkt, "EPSG:3857", lon, lat)
    np.testing.assert_allclose(x2, ex, rtol=0, atol=1e-4)

    # guards: both datum paths declared → loud; non-NTv2 grids → loud;
    # @null means no grid
    both = GEOGCS_NAD27ISH.format(
        ext=',TOWGS84[10,20,30,0,0,0,0],'
            f'EXTENSION["PROJ4_GRIDS","{path}"]')
    with pytest.raises(ValueError, match="BOTH"):
        parse_sref(both)
    with pytest.raises(ValueError, match="BOTH"):
        parse_sref(GEOGCS_NAD27ISH.format(ext=",TOWGS84[10,20,30,0,0,0,0]")
                   + "|NTV2:" + path)
    with pytest.raises(ValueError, match="no NTv2"):
        parse_sref(GEOGCS_NAD27ISH.format(
            ext=',EXTENSION["PROJ4_GRIDS","conus.gtx"]'))
    assert "ntv2" not in parse_sref(GEOGCS_NAD27ISH.format(
        ext=',EXTENSION["PROJ4_GRIDS","@null"]'))
    with pytest.raises(ValueError, match="empty NTv2"):
        parse_sref("EPSG:4326|NTV2:")


def test_ntv2_column_backend_matches_numpy(spark, tmp_path):
    import pyspark.sql.functions as F

    from veranda_spark.functions.crs import NP, SPARK, transform

    path, _ = _affine_grid(tmp_path)
    src = GEOGCS_NAD27ISH.format(ext="") + "|NTV2:" + path
    rng = np.random.default_rng(73)
    lon = rng.uniform(-9, 9, 150)
    lat = rng.uniform(41, 49, 150)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(lon, lat)],
        "lon double, lat double",
    )
    xs, ys = transform(SPARK, src, "EPSG:3857", F.col("lon"), F.col("lat"))
    got = df.select(xs.alias("x"), ys.alias("y")).collect()
    ex, ey = transform(NP, src, "EPSG:3857", lon, lat)
    np.testing.assert_allclose([r["x"] for r in got], ex,
                               rtol=1e-12, atol=1e-6)
    np.testing.assert_allclose([r["y"] for r in got], ey,
                               rtol=1e-12, atol=1e-6)
    # Column inverse leg (pandas UDF with inverse=True) closes too
    los, las = transform(SPARK, "EPSG:3857", src, F.col("x"), F.col("y"))
    back = (
        df.select(xs.alias("x"), ys.alias("y"))
        .select(los.alias("lo"), las.alias("la"))
        .collect()
    )
    np.testing.assert_allclose([r["lo"] for r in back], lon, atol=1e-8)
    np.testing.assert_allclose([r["la"] for r in back], lat, atol=1e-8)


def test_review_fixes_gstype_gridlist_conflicts(tmp_path):
    from veranda_spark.functions.crs import parse_sref

    path, _ = _affine_grid(tmp_path)

    # GS_TYPE other than SECONDS refuses loudly instead of misreading
    data = bytearray(open(path, "rb").read())
    off = 16 * 3 + 8  # GS_TYPE record value slot in the overview header
    data[off:off + 8] = b"MINUTES "
    minutes = tmp_path / "minutes.gsb"
    minutes.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="GS_TYPE"):
        read_ntv2(str(minutes))

    # PROJ-style multi-grid lists: first readable .gsb wins, @optional
    # and unsupported formats are skipped; all-unsupported raises
    p = parse_sref(GEOGCS_NAD27ISH.format(
        ext=',EXTENSION["PROJ4_GRIDS",'
            f'"@conus,@alaska,@{path},@ntv1_can.dat"]'))
    assert p["ntv2"] == path
    with pytest.raises(ValueError, match="no NTv2"):
        parse_sref(GEOGCS_NAD27ISH.format(
            ext=',EXTENSION["PROJ4_GRIDS","@conus,@alaska"]'))

    # a |NTV2: suffix conflicting with the WKT's own grid raises; the
    # SAME path twice is tolerated
    wkt = GEOGCS_NAD27ISH.format(
        ext=f',EXTENSION["PROJ4_GRIDS","{path}"]')
    with pytest.raises(ValueError, match="second NTv2"):
        parse_sref(wkt + "|NTV2:/elsewhere.gsb")
    assert parse_sref(wkt + "|NTV2:" + path)["ntv2"] == path


def test_esri_hom_natural_origin_spelling():
    from veranda_spark.functions.crs import parse_sref

    wkt = (
        'PROJCS["RSO esri",GEOGCS["Timbalai 1948",'
        'DATUM["Timbalai_1948",SPHEROID["Everest 1830 (1967 Definition)",'
        '6377298.556,300.8017]],PRIMEM["Greenwich",0],'
        'UNIT["degree",0.0174532925199433]],'
        'PROJECTION["Hotine_Oblique_Mercator_Azimuth_Natural_Origin"],'
        'PARAMETER["latitude_of_center",4],'
        'PARAMETER["longitude_of_center",115],'
        'PARAMETER["azimuth",53.31582047222222],'
        'PARAMETER["rectified_grid_angle",53.13010236111111],'
        'PARAMETER["scale_factor",0.99984],'
        'PARAMETER["false_easting",0],'
        'PARAMETER["false_northing",0],UNIT["metre",1]]'
    )
    p = parse_sref(wkt)
    assert p["kind"] == "hom" and p["variant"] == "A"
