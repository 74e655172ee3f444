"""NetCDF-classic codec tests.

Two validation strategies (no netCDF4/scipy/xarray in the sandbox):

1. SPEC GOLDENS — tiny files hand-assembled byte-by-byte in the test
   from the public Unidata classic-format spec, independently of the
   codec, asserted equal to nc_encode output and parsed by nc_decode.
2. REFERENCE SEMANTICS — the behaviors pinned by the reference's
   tests/raster/native/netcdf/test_netcdf4.py:5-119 (round-trip,
   auto-decode sig*2+3, unlimited-dim append doubling, time units,
   x/y coordinate formula, non-temporal record dim), reproduced on the
   ncds/stack API.
"""

import struct

import numpy as np
import pytest

from veranda_spark.functions.netcdf import (
    GM_VAR,
    decode_time,
    encode_time,
    nc_append,
    nc_decode,
    nc_decode_stack,
    nc_encode,
    nc_encode_stack,
    nc_geotrans,
    nc_info,
    nc_xy_coords,
)


# ---- spec goldens ----------------------------------------------------------


def _name(s: str) -> bytes:
    b = s.encode()
    pad = (-len(b)) % 4
    return struct.pack(">I", len(b)) + b + b"\x00" * pad


def test_golden_fixed_var_bytes():
    # CDF-1, dim x=2, one int16 fixed var 'v' = [1, 2]; header is 80
    # bytes so begin=80; data 00 01 00 02 (already 4-aligned)
    golden = (
        b"CDF\x01"
        + struct.pack(">I", 0)                      # numrecs
        + struct.pack(">II", 0x0A, 1) + _name("x")  # dim list
        + struct.pack(">I", 2)
        + struct.pack(">II", 0, 0)                  # global atts ABSENT
        + struct.pack(">II", 0x0B, 1) + _name("v")  # var list
        + struct.pack(">I", 1) + struct.pack(">I", 0)   # ndims, dimid
        + struct.pack(">II", 0, 0)                  # var atts ABSENT
        + struct.pack(">I", 3)                      # NC_SHORT
        + struct.pack(">I", 4)                      # vsize (2*2 → pad 4)
        + struct.pack(">I", 80)                     # begin
        + struct.pack(">hh", 1, 2)
    )
    ncds = {
        "dims": {"x": 2},
        "vars": {"v": {"dims": ("x",), "data": np.array([1, 2], dtype="int16"),
                       "attrs": {}}},
        "attrs": {},
    }
    assert nc_encode(ncds) == golden
    back = nc_decode(golden)
    assert back["dims"] == {"x": 2}
    np.testing.assert_array_equal(back["vars"]["v"]["data"], [1, 2])


def test_golden_single_record_var_unpadded():
    # the spec's exceptional case: ONE record variable of a small type
    # (int16 scalar per record) packs records WITHOUT padding — vsize=2
    # and record r starts at begin + 2*r
    golden = (
        b"CDF\x01"
        + struct.pack(">I", 3)
        + struct.pack(">II", 0x0A, 1) + _name("t") + struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">II", 0x0B, 1) + _name("r")
        + struct.pack(">I", 1) + struct.pack(">I", 0)
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 3)                      # NC_SHORT
        + struct.pack(">I", 2)                      # vsize UNPADDED
        + struct.pack(">I", 80)
        + struct.pack(">hhh", 5, 6, 7)
    )
    ncds = {
        "dims": {"t": None},
        "vars": {"r": {"dims": ("t",),
                       "data": np.array([5, 6, 7], dtype="int16"),
                       "attrs": {}}},
        "attrs": {},
    }
    assert nc_encode(ncds) == golden
    back = nc_decode(golden)
    assert back["numrecs"] == 3
    np.testing.assert_array_equal(back["vars"]["r"]["data"], [5, 6, 7])


def test_two_record_vars_interleave_with_padding():
    # 'a' int8[3] per record (raw 3 → padded 4) and 'b' int16[1] (raw 2
    # → padded 4): recsize 8, slabs interleave a0 b0 a1 b1
    a = np.arange(6, dtype="int8").reshape(2, 3)
    b = np.array([[100], [200]], dtype="int16")
    ncds = {
        "dims": {"t": None, "k": 3, "m": 1},
        "vars": {
            "a": {"dims": ("t", "k"), "data": a, "attrs": {}},
            "b": {"dims": ("t", "m"), "data": b, "attrs": {}},
        },
        "attrs": {},
    }
    data = nc_encode(ncds)
    info = nc_info(data)
    assert info["numrecs"] == 2
    # record section bytes: a-slab padded to 4, then b-slab padded to 4
    tail = data[-16:]
    assert tail == (
        bytes([0, 1, 2, 0]) + struct.pack(">h", 100) + b"\x00\x00"
        + bytes([3, 4, 5, 0]) + struct.pack(">h", 200) + b"\x00\x00"
    )
    back = nc_decode(data)
    np.testing.assert_array_equal(back["vars"]["a"]["data"], a)
    np.testing.assert_array_equal(back["vars"]["b"]["data"], b)


def test_attrs_roundtrip_all_types():
    ncds = {
        "dims": {"x": 1},
        "vars": {"v": {"dims": ("x",), "data": np.zeros(1, dtype="float32"),
                       "attrs": {"unit": "dB", "count": 7, "gain": 2.5,
                                 "vec": np.array([1.0, 2.0], dtype="float32")}}},
        "attrs": {"title": "stack", "version": 3},
    }
    back = nc_decode(nc_encode(ncds))
    assert back["attrs"] == {"title": "stack", "version": 3}
    va = back["vars"]["v"]["attrs"]
    assert va["unit"] == "dB" and va["count"] == 7 and va["gain"] == 2.5
    np.testing.assert_array_equal(va["vec"], [1.0, 2.0])


def test_cdf2_roundtrip_and_version_byte():
    ncds = {
        "dims": {"x": 4},
        "vars": {"v": {"dims": ("x",),
                       "data": np.arange(4, dtype="float64"), "attrs": {}}},
        "attrs": {},
    }
    data = nc_encode(ncds, version=2)
    assert data[:4] == b"CDF\x02"
    back = nc_decode(data)
    assert back["version"] == 2
    np.testing.assert_array_equal(back["vars"]["v"]["data"], np.arange(4.0))


def test_streaming_numrecs_derived():
    # a writer that died mid-stream leaves numrecs = 0xFFFFFFFF; the
    # reader derives the count from the file size
    ncds = {
        "dims": {"t": None, "x": 2},
        "vars": {"v": {"dims": ("t", "x"),
                       "data": np.arange(6, dtype="int32").reshape(3, 2),
                       "attrs": {}}},
        "attrs": {},
    }
    data = bytearray(nc_encode(ncds))
    data[4:8] = b"\xff\xff\xff\xff"
    back = nc_decode(bytes(data))
    assert back["numrecs"] == 3
    np.testing.assert_array_equal(
        back["vars"]["v"]["data"], np.arange(6).reshape(3, 2)
    )


# ---- loud gates ------------------------------------------------------------


def test_bad_magic_and_malformed_hdf5():
    with pytest.raises(ValueError, match="CDF magic"):
        nc_decode(b"NOPE" + b"\x00" * 16)
    with pytest.raises(ValueError, match="version byte"):
        nc_decode(b"CDF\x03" + b"\x00" * 16)
    # an HDF5 signature with a torn body routes to the hdf5 reader and
    # fails there with a structural error, not a silent best-effort
    with pytest.raises((ValueError, NotImplementedError)):
        nc_decode(b"\x89HDF\r\n\x1a\n" + b"\x00" * 64)


def test_int64_rejected_in_classic():
    ncds = {"dims": {"x": 1},
            "vars": {"v": {"dims": ("x",), "data": np.zeros(1, dtype="int64"),
                           "attrs": {}}}, "attrs": {}}
    with pytest.raises(ValueError, match="version=5"):
        nc_encode(ncds)
    with pytest.raises(ValueError, match="version=5"):
        nc_encode(ncds, version=2)


def test_shape_and_layout_validation():
    with pytest.raises(ValueError, match="one record dim"):
        nc_encode({"dims": {"t": None, "u": None}, "vars": {}, "attrs": {}})
    with pytest.raises(ValueError, match="first dim"):
        nc_encode({
            "dims": {"t": None, "x": 2},
            "vars": {"v": {"dims": ("x", "t"),
                           "data": np.zeros((2, 1), dtype="int32"),
                           "attrs": {}}}, "attrs": {}})
    with pytest.raises(ValueError, match="does not match"):
        nc_encode({
            "dims": {"x": 3},
            "vars": {"v": {"dims": ("x",),
                           "data": np.zeros(2, dtype="int32"),
                           "attrs": {}}}, "attrs": {}})


def test_cdf1_offset_overflow_raises():
    # declare a >2 GiB fixed var without materializing it: shape checks
    # run against dims, so use a tiny array only if shapes match — here
    # we go through the public API with a fake big dim and a matching
    # lazily-shaped array is impossible, so assert the guard via two
    # record-less vars whose computed offsets overflow
    big = np.lib.stride_tricks.as_strided(
        np.zeros(1, dtype="float64"), shape=(300_000_000,), strides=(0,)
    )
    ncds = {"dims": {"x": 300_000_000},
            "vars": {"a": {"dims": ("x",), "data": big, "attrs": {}},
                     "b": {"dims": ("x",), "data": big, "attrs": {}}},
            "attrs": {}}
    with pytest.raises(ValueError, match="CDF-1"):
        nc_encode(ncds)


# ---- reference semantics (test_netcdf4.py parity) --------------------------


def _three_var(shape=(6, 8, 10), attrs=None):
    data = np.ones(shape, dtype="float32")
    attrs = attrs or {}
    return {
        name: data.copy() for name in ("sig", "inc", "azi")
    }, attrs


def test_read_write_roundtrip():
    # reference test_read_write (test_netcdf4.py:5-15): three vars with
    # per-var dtypes/nodata; read returns the written values
    arrays, _ = _three_var()
    data = nc_encode_stack(
        arrays,
        nodatavals={"inc": -9999, "azi": -9999},
        dtypes={"inc": "int32", "azi": "int32"},
        var_attrs={"sig": {"unit": "dB"}, "inc": {"unit": "degree"}},
    )
    ds = nc_decode_stack(data)
    for name in ("sig", "inc", "azi"):
        np.testing.assert_array_equal(ds["vars"][name]["data"], arrays[name])
    assert ds["vars"]["inc"]["data"].dtype == np.int32
    assert ds["vars"]["sig"]["attrs"]["unit"] == "dB"
    assert ds["vars"]["inc"]["attrs"]["_FillValue"] == -9999


def test_use_auto_decoding():
    # reference test_use_auto_decoding (test_netcdf4.py:17-25): attrs
    # carried by the dataset are pass-through on write; auto_decode read
    # applies x*scale+offset — sig*2+3, inc*2, azi (fill only) verbatim
    arrays, _ = _three_var()
    data = nc_encode_stack(
        arrays,
        var_attrs={
            "sig": {"unit": "dB", "scale_factor": 2, "add_offset": 3,
                    "fill_value": -9999},
            "inc": {"unit": "degree", "_FillValue": -9999,
                    "scale_factor": 2, "add_offset": 0},
            "azi": {"unit": "degree", "_FillValue": -9999},
        },
    )
    ds = nc_decode_stack(data, auto_decode=True)
    np.testing.assert_array_equal(ds["vars"]["sig"]["data"],
                                  arrays["sig"] * 2 + 3)
    np.testing.assert_array_equal(ds["vars"]["inc"]["data"],
                                  arrays["inc"] * 2)
    np.testing.assert_array_equal(ds["vars"]["azi"]["data"], arrays["azi"])


def test_ignore_auto_decoding():
    arrays, _ = _three_var()
    data = nc_encode_stack(
        arrays,
        var_attrs={"sig": {"scale_factor": 2, "add_offset": 3}},
    )
    ds = nc_decode_stack(data, auto_decode=False)
    np.testing.assert_array_equal(ds["vars"]["sig"]["data"], arrays["sig"])


def test_append_doubles_stack():
    # reference test_append_to_existing_netcdf (test_netcdf4.py:39-51)
    sig = np.arange(2 * 3 * 4, dtype="float32").reshape(2, 3, 4)
    data = nc_encode_stack({"sig": sig, "inc": sig + 1.0})
    h = nc_info(data)
    appended = nc_append(data, {
        "vars": {
            "sig": {"dims": ("time", "y", "x"), "data": sig},
            "inc": {"dims": ("time", "y", "x"), "data": sig + 1.0},
            "time": {"dims": ("time",),
                     "data": np.arange(2, dtype="float64")},
        }
    })
    ds = nc_decode(appended)
    assert ds["numrecs"] == 2 * h["numrecs"]
    np.testing.assert_array_equal(
        ds["vars"]["sig"]["data"], np.concatenate([sig, sig], axis=0)
    )
    np.testing.assert_array_equal(
        ds["vars"]["inc"]["data"],
        np.concatenate([sig + 1.0, sig + 1.0], axis=0),
    )


def test_append_validates():
    sig = np.ones((2, 2, 2), dtype="float32")
    data = nc_encode_stack({"sig": sig})
    with pytest.raises(ValueError, match="missing record variable"):
        nc_append(data, {"vars": {"sig": {"dims": (), "data": sig}}})
    full = {"time": {"dims": ("time",), "data": np.zeros(1)},
            "sig": {"dims": ("time", "y", "x"),
                    "data": np.ones((1, 2, 2), dtype="int32")}}
    with pytest.raises(ValueError, match="dtype mismatch"):
        nc_append(data, {"vars": full})
    full["sig"]["data"] = np.ones((1, 3, 3), dtype="float32")
    with pytest.raises(ValueError, match="shape mismatch"):
        nc_append(data, {"vars": full})
    fixed_only = nc_encode({"dims": {"x": 1},
                            "vars": {"v": {"dims": ("x",),
                                           "data": np.zeros(1, dtype="int32"),
                                           "attrs": {}}}, "attrs": {}})
    with pytest.raises(ValueError, match="no record dimension"):
        nc_append(fixed_only, {"vars": {}})


def test_time_units_roundtrip():
    # reference test_time_units (test_netcdf4.py:82-90)
    units = "days since 2000-01-01 00:00:00"
    times = np.array(["2000-01-01", "2000-01-02", "2000-01-05"],
                     dtype="datetime64[ns]")
    enc = encode_time(times, units)
    np.testing.assert_array_equal(enc, [0.0, 1.0, 4.0])
    np.testing.assert_array_equal(decode_time(enc, units), times)

    sig = np.ones((3, 2, 2), dtype="float32")
    data = nc_encode_stack({"sig": sig}, record_values=times,
                           time_units=units)
    ds = nc_decode_stack(data)
    np.testing.assert_array_equal(ds["vars"]["time"]["data"], times)

    with pytest.raises(ValueError, match="time units"):
        encode_time(times, "fortnights since 2000-01-01")
    # sub-day epoch + hours granularity
    u2 = "hours since 1987-06-05 13:30:00"
    t2 = decode_time(np.array([0.0, 1.5]), u2)
    assert str(t2[0]) == "1987-06-05T13:30:00.000000000"
    assert str(t2[1]) == "1987-06-05T15:00:00.000000000"


def test_xy_coordinate_formula():
    # reference test_computation_of_x_and_y_coordinates
    # (test_netcdf4.py:96-117): pixel-center coords, including the
    # same-axis index in the rotation term
    geotrans = (3000000.0, 500.0, 0.0, 1800000.0, 0.0, -500.0)
    n = 10
    x, y = nc_xy_coords(geotrans, n, n)
    exp_x = geotrans[0] + (0.5 + np.arange(n)) * geotrans[1] \
        + (0.5 + np.arange(n)) * geotrans[2]
    exp_y = geotrans[3] + (0.5 + np.arange(n)) * geotrans[4] \
        + (0.5 + np.arange(n)) * geotrans[5]
    np.testing.assert_array_equal(x, exp_x)
    np.testing.assert_array_equal(y, exp_y)

    sig = np.ones((2, n, n), dtype="float32")
    data = nc_encode_stack({"sig": sig}, geotrans=geotrans)
    ds = nc_decode(data)
    np.testing.assert_array_equal(ds["vars"]["x"]["data"], exp_x)
    np.testing.assert_array_equal(ds["vars"]["y"]["data"], exp_y)


def test_non_temporal_record_dim():
    # reference test_non_temporal_read_and_write (test_netcdf4.py:120+):
    # stack_dims={'layer': None}
    sig = np.arange(3 * 2 * 2, dtype="float32").reshape(3, 2, 2)
    data = nc_encode_stack({"sig": sig}, record_dim="layer")
    ds = nc_decode_stack(data)
    assert ds["dims"]["layer"] is None
    np.testing.assert_array_equal(ds["vars"]["layer"]["data"],
                                  [0.0, 1.0, 2.0])
    np.testing.assert_array_equal(ds["vars"]["sig"]["data"], sig)


def test_geotrans_recovery():
    geotrans = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
    sig = np.ones((1, 4, 6), dtype="float32")
    data = nc_encode_stack({"sig": sig}, geotrans=geotrans,
                           sref="EPSG:32633")
    assert nc_geotrans(data) == geotrans
    info = nc_info(data)
    assert info["vars"][GM_VAR]["attrs"]["crs_wkt"] == "EPSG:32633"

    # fallback: derive from x/y coord spacing when the gm var is absent
    x, y = nc_xy_coords(geotrans, 6, 4)
    plain = nc_encode({
        "dims": {"y": 4, "x": 6},
        "vars": {"x": {"dims": ("x",), "data": x, "attrs": {}},
                 "y": {"dims": ("y",), "data": y, "attrs": {}},
                 "v": {"dims": ("y", "x"),
                       "data": np.zeros((4, 6), dtype="float32"),
                       "attrs": {}}},
        "attrs": {}})
    assert nc_geotrans(plain) == pytest.approx(geotrans)

    no_geo = nc_encode_stack({"sig": sig})
    assert nc_geotrans(no_geo) is None


def test_info_shapes_and_dtypes():
    sig = np.ones((5, 3, 4), dtype="float32")
    data = nc_encode_stack({"sig": sig}, dtypes={"sig": "int16"})
    info = nc_info(data)
    assert info["vars"]["sig"]["shape"] == (5, 3, 4)
    assert info["vars"]["sig"]["dims"] == ("time", "y", "x")
    assert info["vars"]["sig"]["dtype"] == "int16"
    assert info["dims"] == {"time": None, "y": 3, "x": 4}


# ---- Spark wiring ----------------------------------------------------------


def test_spark_sniff_and_footprint_recovery(spark):
    # .nc payloads built per-row, sniffed by register, and placed on the
    # grid from their own GeoTransform — the reference's register⋈mosaic
    # georeferencing path for NetCDF (mosaic/netcdf.py reader), via the
    # same Arrow pass as the GeoTIFF twin
    from veranda_spark.grid import RegularGrid
    from veranda_spark.sources.register import (
        footprints_from_netcdf,
        sniff_fmt,
    )

    g = RegularGrid(ul_x=100.0, ul_y=400.0, psx=2.0, psy=2.0,
                    tile_cols=64, tile_rows=64, n_tile_cols=8, n_tile_rows=8)
    rows = []
    for i in range(6):
        col0, row0 = 32 * i, 16 * i
        gt = (100.0 + 2.0 * col0, 2.0, 0.0, 400.0 - 2.0 * row0, 0.0, -2.0)
        sig = np.full((1, 4, 4), float(i), dtype="float32")
        rows.append((i, nc_encode_stack({"sig": sig}, geotrans=gt)))
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    fmts = df.select(sniff_fmt(df["bytes"]).alias("fmt")).distinct().collect()
    assert [r["fmt"] for r in fmts] == ["nc"]
    rec = {r["image_id"]: r for r in footprints_from_netcdf(df, g).collect()}
    for i in range(6):
        assert rec[i]["px_col0"] == 32 * i
        assert rec[i]["px_row0"] == 16 * i

    hdf = spark.createDataFrame(
        [(0, b"\x89HDF\r\n\x1a\n" + b"\x00" * 16)],
        "image_id long, bytes binary",
    )
    assert hdf.select(
        sniff_fmt(hdf["bytes"]).alias("fmt")
    ).first()["fmt"] == "hdf5"


def test_time_like_units_on_data_var_not_datetime_decoded():
    # review r6 #3: a DATA variable whose units string matches the CF
    # time pattern (an elapsed-seconds measurement, packed with a
    # scale_factor) must flow through CF unpacking, NOT be decoded to
    # absolute datetimes from still-packed values.  Only the record
    # COORDINATE (1-D, named after its own dim) gets datetime decode.
    elapsed = np.array([[[2.5, 3.0], [4.5, 0.0]]], dtype="float64")
    data = nc_encode_stack(
        {"elapsed": elapsed},
        var_attrs={"elapsed": {"units": "seconds since 2020-01-01",
                               "scale_factor": 2.0, "add_offset": 0.0}},
    )
    ds = nc_decode_stack(data, auto_decode=True)
    got = ds["vars"]["elapsed"]["data"]
    assert got.dtype.kind == "f", got.dtype
    np.testing.assert_array_equal(got, elapsed * 2.0)
    # the record coord itself still datetime-decodes
    times = np.array(["2021-03-01", "2021-03-02"], dtype="datetime64[ns]")
    sig = np.ones((2, 2, 2), dtype="float32")
    d2 = nc_encode_stack({"sig": sig}, record_values=times,
                         time_units="days since 2021-03-01")
    ds2 = nc_decode_stack(d2, auto_decode=True)
    np.testing.assert_array_equal(ds2["vars"]["time"]["data"], times)


# ---- CDF-5 (NETCDF3_64BIT_DATA) --------------------------------------------
# Reference accepts nc_format="NETCDF3_64BIT_DATA"
# (/root/reference/src/veranda/raster/native/netcdf.py:100-103); the
# PnetCDF CDF-5 spec widens every NON_NEG header field to INT64 and adds
# ubyte/ushort/uint/int64/uint64 external types.


def _name5(s: str) -> bytes:
    b = s.encode()
    pad = (-len(b)) % 4
    return struct.pack(">Q", len(b)) + b + b"\x00" * pad


def test_golden_cdf5_fixed_var_bytes():
    # CDF-5, dim x=2, one uint64 fixed var 'v' = [1, 2].  Every NON_NEG
    # (numrecs, list counts, name lengths, dim length, ndims, dimid,
    # vsize) is 8 bytes; tags and the type id stay 4; begin is 8.
    # Header: 4+8 + (4+8 + 12 + 8) + (4+8) + (4+8 + 12+8+8 + (4+8) +
    # 4+8+8) = 128.
    golden = (
        b"CDF\x05"
        + struct.pack(">Q", 0)                        # numrecs (8B)
        + struct.pack(">IQ", 0x0A, 1) + _name5("x")   # dim list
        + struct.pack(">Q", 2)                        # dim length (8B)
        + struct.pack(">IQ", 0, 0)                    # global atts ABSENT
        + struct.pack(">IQ", 0x0B, 1) + _name5("v")   # var list
        + struct.pack(">Q", 1) + struct.pack(">Q", 0)  # ndims, dimid (8B)
        + struct.pack(">IQ", 0, 0)                    # var atts ABSENT
        + struct.pack(">I", 11)                       # NC_UINT64 (4B)
        + struct.pack(">Q", 16)                       # vsize (8B)
        + struct.pack(">Q", 128)                      # begin (8B)
        + struct.pack(">QQ", 1, 2)
    )
    ncds = {
        "dims": {"x": 2},
        "vars": {"v": {"dims": ("x",),
                       "data": np.array([1, 2], dtype="uint64"),
                       "attrs": {}}},
        "attrs": {},
    }
    assert nc_encode(ncds, version=5) == golden
    back = nc_decode(golden)
    assert back["version"] == 5 and back["dims"] == {"x": 2}
    assert back["vars"]["v"]["data"].dtype == np.uint64
    np.testing.assert_array_equal(back["vars"]["v"]["data"], [1, 2])


def test_cdf5_all_new_types_roundtrip():
    rng = np.random.default_rng(11)
    ncds = {
        "dims": {"time": None, "y": 3, "x": 4},
        "attrs": {"big": 2**40, "uv": np.arange(3, dtype="uint64")},
        "vars": {
            "t": {"dims": ("time",), "data": np.arange(2, dtype="int64"),
                  "attrs": {}},
            "u64": {"dims": ("time", "y", "x"),
                    "data": rng.integers(0, 2**63, (2, 3, 4)).astype("uint64"),
                    "attrs": {}},
            "u32": {"dims": ("time", "x"),
                    "data": rng.integers(0, 2**32, (2, 4)).astype("uint32"),
                    "attrs": {}},
            "u16": {"dims": ("y", "x"),
                    "data": rng.integers(0, 2**16, (3, 4)).astype("uint16"),
                    "attrs": {}},
            "u8": {"dims": ("x",), "data": np.arange(4, dtype="uint8"),
                   "attrs": {}},
            "i64": {"dims": ("y",),
                    "data": np.array([-2**62, 0, 2**62], dtype="int64"),
                    "attrs": {}},
        },
    }
    data = nc_encode(ncds, version=5)
    assert data[:4] == b"CDF\x05"
    back = nc_decode(data)
    for k, v in ncds["vars"].items():
        assert back["vars"][k]["data"].dtype == v["data"].dtype, k
        np.testing.assert_array_equal(back["vars"][k]["data"], v["data"])
    # an int attr beyond NC_INT range is carried as NC_INT64 in CDF-5...
    assert back["attrs"]["big"] == 2**40
    np.testing.assert_array_equal(back["attrs"]["uv"],
                                  np.arange(3, dtype="uint64"))
    # ...but refused loudly in CDF-1/2
    with pytest.raises(ValueError, match="overflows NC_INT"):
        nc_encode({"dims": {}, "vars": {}, "attrs": {"big": 2**40}})


def test_cdf5_append_patches_8byte_numrecs():
    ncds = {
        "dims": {"t": None, "x": 2},
        "vars": {"v": {"dims": ("t", "x"),
                       "data": np.array([[1, 2]], dtype="uint64"),
                       "attrs": {}}},
        "attrs": {},
    }
    data = nc_encode(ncds, version=5)
    more = nc_append(data, {"vars": {"v": {
        "dims": ("t", "x"), "data": np.array([[3, 4], [5, 6]],
                                             dtype="uint64")}}})
    # existing bytes beyond the numrecs field are untouched
    assert more[12:len(data)] == data[12:]
    assert struct.unpack(">Q", more[4:12])[0] == 3
    back = nc_decode(more)
    np.testing.assert_array_equal(back["vars"]["v"]["data"],
                                  [[1, 2], [3, 4], [5, 6]])


def test_cdf5_streaming_numrecs_derived():
    ncds = {
        "dims": {"t": None},
        "vars": {"v": {"dims": ("t",),
                       "data": np.arange(4, dtype="float64"), "attrs": {}}},
        "attrs": {},
    }
    data = nc_encode(ncds, version=5)
    torn = data[:4] + struct.pack(">Q", 0xFFFFFFFFFFFFFFFF) + data[12:]
    back = nc_decode(torn)
    assert back["numrecs"] == 4
    np.testing.assert_array_equal(back["vars"]["v"]["data"],
                                  np.arange(4, dtype="float64"))


def test_cdf5_single_small_record_var_unpadded():
    # the unpadded exception extends to the CDF-5 sub-4-byte types
    ncds = {
        "dims": {"t": None},
        "vars": {"r": {"dims": ("t",),
                       "data": np.array([5, 6, 7], dtype="uint16"),
                       "attrs": {}}},
        "attrs": {},
    }
    data = nc_encode(ncds, version=5)
    info = nc_info(data)
    assert info["numrecs"] == 3
    back = nc_decode(data)
    np.testing.assert_array_equal(back["vars"]["r"]["data"], [5, 6, 7])
    # records really are 2 bytes apart: total = header + 3*2
    h_back = nc_decode(nc_encode({**ncds, "vars": {"r": {
        "dims": ("t",), "data": np.zeros((0,), dtype="uint16"),
        "attrs": {}}}}, version=5))
    assert h_back["numrecs"] == 0


def test_classic_file_with_cdf5_type_id_refused():
    # a CDF-1 header claiming NC_INT64 is corrupt, not decodable
    small = nc_encode({
        "dims": {"x": 2},
        "vars": {"a": {"dims": ("x",),
                       "data": np.array([1, 2], dtype="int32"),
                       "attrs": {}}}, "attrs": {}})
    idx = small.find(struct.pack(">I", 4), small.find(b"a"))
    forged = small[:idx] + struct.pack(">I", 10) + small[idx + 4:]
    with pytest.raises(ValueError, match="CDF-5-only"):
        nc_decode(forged)


def test_classic_vsize_overflow_requires_cdf5():
    big = np.lib.stride_tricks.as_strided(
        np.zeros(1, dtype="float64"), shape=(600_000_000,), strides=(0,)
    )
    ncds = {"dims": {"x": 600_000_000},
            "vars": {"a": {"dims": ("x",), "data": big, "attrs": {}}},
            "attrs": {}}
    with pytest.raises(ValueError, match="vsize"):
        nc_encode(ncds, version=2)


def test_stack_writer_emits_cdf5():
    arrays = {"sig": np.ones((2, 4, 5), dtype="float32")}
    data = nc_encode_stack(arrays, version=5)
    assert data[:4] == b"CDF\x05"
    ds = nc_decode_stack(data)
    np.testing.assert_array_equal(ds["vars"]["sig"]["data"], arrays["sig"])


# ---- property-based fuzz (VERDICT r6 #5): randomized dims/vars/dtypes ------

from hypothesis import given, settings, strategies as st  # noqa: E402

_FUZZ_DTYPES = {
    1: ["int8", "int16", "int32", "float32", "float64", "S1"],
    2: ["int8", "int16", "int32", "float32", "float64", "S1"],
    # NETCDF4_CLASSIC enforces the classic data model (that is the
    # _CLASSIC suffix), so its type set matches CDF-1/2
    4: ["int8", "int16", "int32", "float32", "float64", "S1"],
    5: ["int8", "int16", "int32", "float32", "float64", "S1",
        "uint8", "uint16", "uint32", "int64", "uint64"],
}


def _fuzz_ncds(rng, version, n_fixed_dims, has_rec, n_vars, numrecs):
    """Random ncds: random dim sizes, random per-var dim subsets (record
    dim first when used), random dtypes legal for the version, mixed
    attrs, names of varying length (pads every 4-byte boundary case)."""
    dims = {}
    if has_rec:
        dims["rec"] = None
    for i in range(n_fixed_dims):
        dims[f"d{'x' * (i % 4)}{i}"] = int(rng.integers(1, 5))
    fixed_names = [d for d in dims if dims[d] is not None]
    vars_ = {}
    for j in range(n_vars):
        vdims = []
        if has_rec and rng.random() < 0.6:
            vdims.append("rec")
        k = int(rng.integers(0, len(fixed_names) + 1))
        vdims += list(rng.choice(fixed_names, size=k, replace=False))
        dt = rng.choice(_FUZZ_DTYPES[version])
        shape = tuple(numrecs if d == "rec" else dims[d] for d in vdims)
        if dt == "S1":
            data = rng.integers(32, 127, shape, dtype="uint8").astype("S1")
        elif dt.startswith("f"):
            data = rng.random(shape).astype(dt)
        else:
            info = np.iinfo(dt)
            data = rng.integers(info.min, int(info.max) + 1, shape,
                                dtype=dt)
        attrs = {}
        if rng.random() < 0.5:
            attrs["label"] = "x" * int(rng.integers(1, 9))
        if rng.random() < 0.5:
            attrs["iv"] = int(rng.integers(-1000, 1000))
        if rng.random() < 0.3:
            attrs["fv"] = [float(x) for x in rng.random(2)]
        vars_[f"v{'y' * (j % 4)}{j}"] = {
            "dims": tuple(vdims), "data": data, "attrs": attrs,
        }
    gattrs = {"title": "f" * int(rng.integers(0, 7))}
    return {"dims": dims, "vars": vars_, "attrs": gattrs}


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    version=st.sampled_from([1, 2, 4, 5]),
    n_fixed_dims=st.integers(1, 3),
    has_rec=st.booleans(),
    n_vars=st.integers(0, 5),
    numrecs=st.integers(0, 4),
)
def test_fuzz_encode_decode_roundtrip(seed, version, n_fixed_dims, has_rec,
                                      n_vars, numrecs):
    rng = np.random.default_rng(seed)
    ncds = _fuzz_ncds(rng, version, n_fixed_dims, has_rec, n_vars, numrecs)
    data = nc_encode(ncds, version=version)
    if version == 4:
        assert data[:4] == b"\x89HDF"
    else:
        assert data[3] == version
    back = nc_decode(data)
    assert back["dims"] == ncds["dims"]
    assert back["attrs"] == ncds["attrs"]
    for name, v in ncds["vars"].items():
        got = back["vars"][name]
        assert got["dims"] == tuple(v["dims"]), name
        assert got["data"].dtype == np.asarray(v["data"]).dtype, name
        np.testing.assert_array_equal(got["data"], v["data"], err_msg=name)
        for k, want in v["attrs"].items():
            have = got["attrs"][k]
            if isinstance(want, list):
                np.testing.assert_array_equal(have, want)
            else:
                assert have == want, (name, k)
    # info agrees without touching data
    info = nc_info(data)
    rec_vars = [n for n, v in ncds["vars"].items()
                if v["dims"][:1] == ("rec",)]
    assert info["numrecs"] == (numrecs if rec_vars else 0)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    version=st.sampled_from([1, 2, 4, 5]),
    n_vars=st.integers(1, 4),
    numrecs=st.integers(0, 3),
    n_app=st.integers(1, 3),
)
def test_fuzz_append_roundtrip(seed, version, n_vars, numrecs, n_app):
    rng = np.random.default_rng(seed)
    ncds = _fuzz_ncds(rng, version, 2, True, n_vars, numrecs)
    rec_vars = {n: v for n, v in ncds["vars"].items()
                if v["dims"][:1] == ("rec",)}
    if not rec_vars:
        return  # nothing to append along
    data = nc_encode(ncds, version=version)
    app = {"vars": {}}
    for n, v in rec_vars.items():
        tail_shape = (n_app,) + np.asarray(v["data"]).shape[1:]
        dt = np.asarray(v["data"]).dtype
        if dt.kind == "S":
            tail = rng.integers(32, 127, tail_shape,
                                dtype="uint8").astype("S1")
        elif dt.kind == "f":
            tail = rng.random(tail_shape).astype(dt)
        else:
            info = np.iinfo(dt)
            tail = rng.integers(info.min, int(info.max) + 1, tail_shape,
                                dtype=dt)
        app["vars"][n] = {"dims": v["dims"], "data": tail}
    more = nc_append(data, app)
    back = nc_decode(more)
    assert back["numrecs"] == numrecs + n_app
    for n, v in rec_vars.items():
        want = np.concatenate([np.asarray(v["data"]),
                               app["vars"][n]["data"]])
        np.testing.assert_array_equal(back["vars"][n]["data"], want,
                                      err_msg=n)
    # non-record variables untouched
    for n, v in ncds["vars"].items():
        if n not in rec_vars:
            np.testing.assert_array_equal(back["vars"][n]["data"],
                                          v["data"], err_msg=n)


# ---- NETCDF4_CLASSIC (HDF5 container, round 7) -----------------------------
# The reference's DEFAULT write format (native/netcdf.py:29); the same
# reference semantics pinned above for the classic formats run through
# version=4 on the functions/hdf5.py subset codec.


def test_nc4_roundtrip_with_unlimited_and_coord_vars():
    rng = np.random.default_rng(21)
    ncds = {
        "dims": {"time": None, "y": 3, "x": 4},
        "attrs": {"title": "v4", "n": 7},
        "vars": {
            "time": {"dims": ("time",), "data": np.array([5.0, 7.0]),
                     "attrs": {"units": "days since 2020-01-01"}},
            "sig": {"dims": ("time", "y", "x"),
                    "data": rng.random((2, 3, 4)).astype("float32"),
                    "attrs": {"unit": "dB"}},
            "inc": {"dims": ("y", "x"),
                    "data": rng.integers(0, 90, (3, 4)).astype("int32"),
                    "attrs": {"_FillValue": -9999}},
        },
    }
    data = nc_encode(ncds, version=4)
    assert data[:4] == b"\x89HDF"
    back = nc_decode(data)
    assert back["version"] == 4
    assert back["dims"] == {"time": None, "y": 3, "x": 4}
    assert back["numrecs"] == 2
    assert back["attrs"] == {"title": "v4", "n": 7}
    for k in ncds["vars"]:
        got = back["vars"][k]
        assert got["dims"] == tuple(ncds["vars"][k]["dims"]), k
        np.testing.assert_array_equal(got["data"], ncds["vars"][k]["data"])
    # convention plumbing attrs are stripped from user view
    assert "DIMENSION_LIST" not in back["vars"]["sig"]["attrs"]
    assert back["vars"]["inc"]["attrs"]["_FillValue"] == -9999
    # nc_info agrees through the v4 path
    info = nc_info(data)
    assert info["version"] == 4 and info["numrecs"] == 2
    assert info["vars"]["sig"]["shape"] == (2, 3, 4)


def test_nc4_append_semantics_match_classic():
    # mode='a' doubles the stack (reference test_netcdf4.py:39-51) —
    # identical outcome through the decode+concat+re-encode path
    ncds = {
        "dims": {"t": None, "x": 2},
        "vars": {"v": {"dims": ("t", "x"),
                       "data": np.arange(4, dtype="float32").reshape(2, 2),
                       "attrs": {}},
                 "s": {"dims": ("x",),
                       "data": np.array([9, 9], dtype="int32"),
                       "attrs": {}}},
        "attrs": {"keep": "me"},
    }
    data = nc_encode(ncds, version=4)
    more = nc_append(data, {"vars": {"v": {
        "dims": ("t", "x"),
        "data": np.arange(4, 8, dtype="float32").reshape(2, 2)}}})
    back = nc_decode(more)
    assert back["numrecs"] == 4
    np.testing.assert_array_equal(
        back["vars"]["v"]["data"],
        np.arange(8, dtype="float32").reshape(4, 2),
    )
    np.testing.assert_array_equal(back["vars"]["s"]["data"], [9, 9])
    assert back["attrs"] == {"keep": "me"}
    with pytest.raises(ValueError, match="dtype mismatch"):
        nc_append(data, {"vars": {"v": {
            "dims": ("t", "x"),
            "data": np.zeros((1, 2), dtype="float64")}}})
    with pytest.raises(ValueError, match="unknown variables"):
        nc_append(data, {"vars": {"v": {
            "dims": ("t", "x"), "data": np.zeros((1, 2), dtype="float32")},
            "nope": {"dims": ("t",), "data": np.zeros(1)}}})


def test_nc4_stack_writer_reference_semantics():
    # the full NetCdf4File-analog loop through version=4: coords, CF
    # time decode, geotransform recovery, auto_decode scaling
    arrays = {"sig": np.full((2, 4, 6), 3.0, dtype="float32")}
    gt = (100.0, 2.0, 0.0, 500.0, 0.0, -2.0)
    blob = nc_encode_stack(
        arrays, geotrans=gt, sref="EPSG:32633",
        time_units="days since 2020-01-01",
        record_values=np.array(["2020-01-05", "2020-01-07"],
                               dtype="datetime64[ns]"),
        scale_factors={"sig": 0.5}, version=4,
    )
    assert blob[:4] == b"\x89HDF"
    assert nc_geotrans(blob) == gt
    ds = nc_decode_stack(blob, auto_decode=True)
    np.testing.assert_allclose(ds["vars"]["sig"]["data"], arrays["sig"])
    assert str(ds["vars"]["time"]["data"][0]) == (
        "2020-01-05T00:00:00.000000000"
    )
    x = ds["vars"]["x"]["data"]
    assert x[0] == 100.0 + 0.5 * 2.0  # pixel-center formula

    # byte identity check across containers: the same ncds through the
    # classic and HDF5 containers decodes to identical values
    blob1 = nc_encode_stack(
        arrays, geotrans=gt, sref="EPSG:32633",
        time_units="days since 2020-01-01",
        record_values=np.array(["2020-01-05", "2020-01-07"],
                               dtype="datetime64[ns]"),
        scale_factors={"sig": 0.5}, version=1,
    )
    d1 = nc_decode_stack(blob1, auto_decode=True)
    d4 = nc_decode_stack(blob, auto_decode=True)
    for k in d1["vars"]:
        np.testing.assert_array_equal(
            np.asarray(d4["vars"][k]["data"]),
            np.asarray(d1["vars"][k]["data"]), err_msg=k,
        )


def test_nc4_phantom_dims_and_int64_rejection():
    # dims without coordinate variables come back as dims, not vars
    ncds = {
        "dims": {"y": 3, "x": 4},
        "vars": {"v": {"dims": ("y", "x"),
                       "data": np.zeros((3, 4), dtype="int16"),
                       "attrs": {}}},
        "attrs": {},
    }
    back = nc_decode(nc_encode(ncds, version=4))
    assert back["dims"] == {"y": 3, "x": 4}
    assert set(back["vars"]) == {"v"}
    # classic MODEL enforcement: int64 data rejected under version=4
    with pytest.raises(ValueError, match="not representable"):
        nc_encode({"dims": {"x": 1}, "attrs": {},
                   "vars": {"v": {"dims": ("x",),
                                  "data": np.zeros(1, dtype="int64"),
                                  "attrs": {}}}}, version=4)


def test_nc4_beyond_2048_records():
    # review r7 #5: the HDF5 writer's 2-level chunk B-tree caps at 2048
    # chunks per dataset; nc4_encode now scales the record-chunk depth
    # so any record count fits
    n = 2100
    ncds = {
        "dims": {"t": None, "x": 2},
        "vars": {"v": {"dims": ("t", "x"),
                       "data": np.arange(2 * n, dtype="float32")
                       .reshape(n, 2),
                       "attrs": {}}},
        "attrs": {},
    }
    data = nc_encode(ncds, version=4)
    back = nc_decode(data)
    assert back["numrecs"] == n
    np.testing.assert_array_equal(back["vars"]["v"]["data"],
                                  ncds["vars"]["v"]["data"])
    more = nc_append(data, {"vars": {"v": {
        "dims": ("t", "x"),
        "data": np.full((3, 2), 7.0, dtype="float32")}}})
    back2 = nc_decode(more)
    assert back2["numrecs"] == n + 3
    np.testing.assert_array_equal(back2["vars"]["v"]["data"][-1], [7.0, 7.0])


def test_nc4_chunksizes_knob():
    # reference NetCdfXrFile(chunksizes=...) parity
    # (tests/raster/native/netcdf/test_xarray.py:41-49): the user-given
    # chunk shape lands in the file (clamped to extents on fixed dims)
    from veranda_spark.functions.hdf5 import h5_read

    n, h, w = 6, 25, 40
    ncds = {
        "dims": {"time": None, "y": h, "x": w},
        "vars": {
            "time": {"dims": ("time",),
                     "data": np.arange(n, dtype="float64"), "attrs": {}},
            "sig": {"dims": ("time", "y", "x"),
                    "data": np.arange(n * h * w, dtype="float32")
                    .reshape(n, h, w), "attrs": {}},
        },
        "attrs": {},
    }
    data = nc_encode(ncds, version=4, chunksizes=(100, 10, 10))
    f = h5_read(data)
    # record dim keeps the requested 100 (unlimited — may exceed the
    # current extent, as netCDF4 allows); fixed dims clamp to size
    assert f["datasets"]["sig"]["chunks"] == (100, 10, 10)
    back = nc_decode(data)
    np.testing.assert_array_equal(back["vars"]["sig"]["data"],
                                  ncds["vars"]["sig"]["data"])
    # clamping: chunk bigger than a fixed dim is cut to the dim
    data2 = nc_encode(ncds, version=4, chunksizes=(2, 100, 100))
    f2 = h5_read(data2)
    assert f2["datasets"]["sig"]["chunks"] == (2, h, w)
    # classic layouts have no chunking — loud error, not silent ignore
    with pytest.raises(ValueError, match="version=4"):
        nc_encode(ncds, version=1, chunksizes=(2, 10, 10))


def test_nc4_chunksizes_validation():
    # review r7 pass-2: float entries coerce cleanly, and a chunk shape
    # exceeding the writer's 2048-chunk B-tree limit fails with a clear
    # ValueError naming chunksizes — not a deep struct/NotImplemented
    ncds = {
        "dims": {"t": None, "y": 25, "x": 40},
        "vars": {"v": {"dims": ("t", "y", "x"),
                       "data": np.zeros((6, 25, 40), dtype="float32"),
                       "attrs": {}}},
        "attrs": {},
    }
    data = nc_encode(ncds, version=4, chunksizes=(100.0, 10.0, 10.0))
    back = nc_decode(data)
    np.testing.assert_array_equal(back["vars"]["v"]["data"],
                                  ncds["vars"]["v"]["data"])
    with pytest.raises(ValueError, match="chunksizes .* 2048"):
        nc_encode(ncds, version=4, chunksizes=(1, 1, 2))
