"""NetCDF container codec (CDF-1/2/5 + NETCDF4-classic), pure numpy.

The reference reaches NetCDF through the netCDF4/xarray C stack
(native/netcdf.py:15-860 ``NetCdf4File``; mosaic/netcdf.py:1-841
reader/writer) — its single largest IO surface.  This engine implements
the binary containers directly from the public Unidata specs the same
way functions/tiff.py implements the TIFF container: plain ``bytes`` →
``dict`` codec functions usable inside Arrow-batched Spark kernels, so
`.nc` payloads decode on executors without any native library.  All
four ``nc_formats`` the reference accepts (native/netcdf.py:100-103)
round-trip: ``NETCDF3_CLASSIC`` (CDF-1), ``NETCDF3_64BIT_OFFSET``
(CDF-2), ``NETCDF3_64BIT_DATA`` (CDF-5, the PnetCDF 64-bit-data
variant: every NON_NEG header field widens to INT64 and five new
external types appear — ubyte/ushort/uint/int64/uint64), and — since
round 7 — ``NETCDF4_CLASSIC`` (``version=4``): the classic data model
on the HDF5 container via the netCDF-4 dimension-scale convention,
backed by the from-scratch HDF5 subset codec in functions/hdf5.py
(which states its own honest scope; features outside that subset still
raise loudly with the feature name).

Data model — a plain "ncds" dict (the xarray.Dataset analog used by the
reference's read()/write() contract, native/netcdf.py:372-452)::

    {"dims":  {name: int | None, ...},        # None → the record dim
     "vars":  {name: {"dims": (dim, ...),
                      "data": np.ndarray,
                      "attrs": {str: str|int|float|ndarray}}, ...},
     "attrs": {...}}                          # global attributes

Byte layout notes (all big-endian):

* header = magic, numrecs, dim_list, gatt_list, var_list; each list is
  ``ABSENT`` (8 zero bytes) or tag, count, entries.
* names and attribute payloads are zero-padded to 4-byte boundaries.
* a variable's ``begin`` offset is 4 bytes in CDF-1, 8 in CDF-2.
* fixed-size variables are stored contiguously at ``begin``; record
  variables interleave per record: record ``r`` of variable ``v`` lives
  at ``v.begin + r * recsize`` where ``recsize`` is the sum of every
  record variable's padded per-record size — EXCEPT when there is
  exactly one record variable of type byte/char/short, which is packed
  without padding (the spec's "exceptional case").
"""

from __future__ import annotations

import re
import struct
from typing import Any

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
#: CDF-5 ("64-bit data") external types — valid ONLY when the version
#: byte is 5 (PnetCDF CDF-5 spec §"Data Types")
NC_UBYTE, NC_USHORT, NC_UINT, NC_INT64, NC_UINT64 = 7, 8, 9, 10, 11
_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C
_STREAMING = 0xFFFFFFFF
_STREAMING64 = 0xFFFFFFFFFFFFFFFF

#: numpy dtype ↔ external type; classic CDF-1/2 has no 64-bit ints and
#: no unsigned types beyond the signed-byte reinterpretation — those
#: five types exist only in CDF-5, and the encode path rejects them
#: loudly for version 1/2 rather than quietly narrowing.
_NC_OF_DTYPE = {
    "int8": NC_BYTE,
    "S1": NC_CHAR,
    "int16": NC_SHORT,
    "int32": NC_INT,
    "float32": NC_FLOAT,
    "float64": NC_DOUBLE,
}
_NC_OF_DTYPE_CDF5 = {
    **_NC_OF_DTYPE,
    "uint8": NC_UBYTE,
    "uint16": NC_USHORT,
    "uint32": NC_UINT,
    "int64": NC_INT64,
    "uint64": NC_UINT64,
}
_DTYPE_OF_NC = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
    NC_UBYTE: np.dtype(">u1"),
    NC_USHORT: np.dtype(">u2"),
    NC_UINT: np.dtype(">u4"),
    NC_INT64: np.dtype(">i8"),
    NC_UINT64: np.dtype(">u8"),
}
_SIZE_OF_NC = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4,
               NC_FLOAT: 4, NC_DOUBLE: 8,
               NC_UBYTE: 1, NC_USHORT: 2, NC_UINT: 4,
               NC_INT64: 8, NC_UINT64: 8}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


def _nc_type_of(arr: np.ndarray, version: int = 1) -> int:
    key = "S1" if arr.dtype.kind == "S" and arr.dtype.itemsize == 1 else arr.dtype.name
    table = _NC_OF_DTYPE_CDF5 if version == 5 else _NC_OF_DTYPE
    t = table.get(key)
    if t is None:
        raise ValueError(
            f"dtype {arr.dtype} is not representable in NetCDF classic "
            "(CDF-1/2 carry int8/int16/int32/float32/float64/char only; "
            "unsigned and 64-bit integers need CDF-5 — pass version=5)"
        )
    return t


def _check_type_version(nc_type: int, version: int) -> None:
    """A CDF-1/2 header carrying a CDF-5-only type id is corrupt —
    refuse rather than decode garbage."""
    if nc_type not in _SIZE_OF_NC:
        raise ValueError(f"unknown NetCDF external type id {nc_type}")
    if nc_type > NC_DOUBLE and version != 5:
        raise ValueError(
            f"external type id {nc_type} is CDF-5-only but the file is "
            f"CDF-{version} — corrupt header"
        )


def _attr_payload(value: Any, version: int = 1) -> tuple[int, int, bytes]:
    """attribute value → (nc_type, nelems, packed big-endian bytes)."""
    if isinstance(value, str):
        b = value.encode("utf-8")
        return NC_CHAR, len(b), b
    if isinstance(value, bytes):
        return NC_CHAR, len(value), value
    if isinstance(value, bool):
        raise ValueError("NetCDF classic has no boolean attribute type")
    if isinstance(value, (int, np.integer)):
        if not (-(2**31) <= int(value) < 2**31):
            if version == 5:
                return NC_INT64, 1, struct.pack(">q", int(value))
            raise ValueError(
                f"attribute {value} overflows NC_INT (CDF-5 would carry "
                "it as NC_INT64 — pass version=5)"
            )
        return NC_INT, 1, struct.pack(">i", int(value))
    if isinstance(value, (float, np.floating)):
        return NC_DOUBLE, 1, struct.pack(">d", float(value))
    arr = np.asarray(value)
    t = _nc_type_of(arr, version)
    return t, arr.size, arr.astype(_DTYPE_OF_NC[t]).tobytes()


def _attr_value(nc_type: int, nelems: int, raw: bytes) -> Any:
    if nc_type == NC_CHAR:
        return raw[:nelems].decode("utf-8", errors="replace")
    arr = np.frombuffer(raw, dtype=_DTYPE_OF_NC[nc_type], count=nelems)
    if nelems == 1:
        return arr[0].item()
    return arr.astype(arr.dtype.newbyteorder("="))


class _W:
    """Big-endian header writer.  Tags and type ids are always 4 bytes;
    every NON_NEG field (counts, name lengths, dim lengths, attr nelems,
    ndims, dimids, vsize) is 4 bytes in CDF-1/2 and 8 in CDF-5."""

    def __init__(self, version: int = 1) -> None:
        self.parts: list[bytes] = []
        self.version = version

    def u4(self, v: int) -> None:
        self.parts.append(struct.pack(">I", v & 0xFFFFFFFF))

    def i4(self, v: int) -> None:
        self.parts.append(struct.pack(">i", v))

    def nn(self, v: int) -> None:
        """NON_NEG per the spec: INT in CDF-1/2, INT64 in CDF-5."""
        if self.version == 5:
            self.parts.append(struct.pack(">Q", v))
        else:
            self.u4(v)

    def name(self, s: str) -> None:
        b = s.encode("utf-8")
        self.nn(len(b))
        self.parts.append(b + b"\x00" * (_pad4(len(b)) - len(b)))

    def attrs(self, attrs: dict) -> None:
        if not attrs:
            self.u4(0)
            self.nn(0)
            return
        self.u4(_TAG_ATT)
        self.nn(len(attrs))
        for k, v in attrs.items():
            t, n, payload = _attr_payload(v, self.version)
            self.name(k)
            self.u4(t)
            self.nn(n)
            self.parts.append(
                payload + b"\x00" * (_pad4(len(payload)) - len(payload))
            )

    def bytes(self) -> bytes:
        return b"".join(self.parts)


def _var_order(ncds: dict) -> tuple[list[str], str | None]:
    """Variable emit order (fixed first, then record vars) + record dim.

    Classic files require the record dimension to be a variable's FIRST
    dimension; validated here so a bad layout fails at encode time, not
    as an unreadable file.
    """
    dims = ncds["dims"]
    rec = [d for d, n in dims.items() if n is None]
    if len(rec) > 1:
        raise ValueError(f"classic NetCDF allows one record dim, got {rec}")
    rec_dim = rec[0] if rec else None
    fixed, record = [], []
    for name, v in ncds["vars"].items():
        vdims = tuple(v["dims"])
        for d in vdims:
            if d not in dims:
                raise ValueError(f"variable {name!r} uses undeclared dim {d!r}")
        if rec_dim is not None and rec_dim in vdims:
            if vdims[0] != rec_dim:
                raise ValueError(
                    f"record dim {rec_dim!r} must be the first dim of "
                    f"{name!r} (classic layout), got {vdims}"
                )
            record.append(name)
        else:
            fixed.append(name)
    return fixed + record, rec_dim


def _per_record_shape(v: dict, rec_dim: str | None) -> tuple[tuple, bool]:
    vdims = tuple(v["dims"])
    is_rec = rec_dim is not None and vdims and vdims[0] == rec_dim
    return (vdims[1:] if is_rec else vdims), is_rec


def nc_encode(ncds: dict, version: int = 1,
              chunksizes: tuple | None = None) -> bytes:
    """ncds dict → NetCDF bytes.  Versions 1/2/5 are the classic wire
    formats (CDF-1; CDF-2 for 64-bit offsets; CDF-5 for 64-bit data —
    wide header fields plus the unsigned/64-bit external types);
    version 4 is ``NETCDF4_CLASSIC`` — the classic data model on the
    HDF5 container via the netCDF-4 dimension-scale convention
    (functions/hdf5.py; the reference's DEFAULT write format,
    native/netcdf.py:29).  Shapes are validated against the declared
    dims; the record-dim length is taken from the data."""
    if version == 4:
        return nc4_encode(ncds, chunksizes=chunksizes)
    if chunksizes is not None:
        raise ValueError(
            "chunksizes applies to the HDF5 container only — classic "
            "CDF layouts are not chunked; pass version=4"
        )
    if version not in (1, 2, 5):
        raise ValueError(
            "version must be 1 (CDF-1), 2 (CDF-2), 4 (NETCDF4_CLASSIC) "
            "or 5 (CDF-5)"
        )
    dims = dict(ncds.get("dims", {}))
    order, rec_dim = _var_order(ncds)
    vars_ = ncds["vars"]

    numrecs = 0
    for name in order:
        v = vars_[name]
        arr = np.asarray(v["data"])
        shape, is_rec = _per_record_shape(v, rec_dim)
        want = tuple(dims[d] for d in shape)
        got = arr.shape[1:] if is_rec else arr.shape
        if got != want:
            raise ValueError(
                f"variable {name!r}: data shape {arr.shape} does not match "
                f"dims {tuple(v['dims'])} = "
                f"{(('rec',) + want) if is_rec else want}"
            )
        if is_rec:
            if numrecs and arr.shape[0] != numrecs:
                raise ValueError(
                    f"record variables disagree on record count: "
                    f"{arr.shape[0]} vs {numrecs}"
                )
            numrecs = arr.shape[0]

    # per-variable sizes; the single-small-record-var packing exception
    rec_vars = [n for n in order
                if _per_record_shape(vars_[n], rec_dim)[1]]
    vsizes: dict[str, int] = {}
    for name in order:
        v = vars_[name]
        shape, _ = _per_record_shape(v, rec_dim)
        t = _nc_type_of(np.asarray(v["data"]), version)
        raw = int(np.prod([dims[d] for d in shape], dtype=np.int64)) * _SIZE_OF_NC[t]
        vsizes[name] = _pad4(raw)
        # the spec's exceptional unpadded case: exactly one record
        # variable of a sub-4-byte type (byte/char/short; CDF-5 adds
        # ubyte/ushort to that set)
        if len(rec_vars) == 1 and name == rec_vars[0] and _SIZE_OF_NC[t] < 4:
            vsizes[name] = raw
    recsize = sum(vsizes[n] for n in rec_vars)

    dim_names = list(dims)

    def header(begins: dict[str, int]) -> bytes:
        w = _W(version)
        w.parts.append(b"CDF" + bytes([version]))
        w.nn(numrecs)
        if dims:
            w.u4(_TAG_DIM)
            w.nn(len(dims))
            for d, n in dims.items():
                w.name(d)
                w.nn(0 if n is None else n)
        else:
            w.u4(0)
            w.nn(0)
        w.attrs(ncds.get("attrs", {}))
        if order:
            w.u4(_TAG_VAR)
            w.nn(len(order))
            for name in order:
                v = vars_[name]
                w.name(name)
                w.nn(len(v["dims"]))
                for d in v["dims"]:
                    w.nn(dim_names.index(d))
                w.attrs(v.get("attrs", {}))
                w.u4(_nc_type_of(np.asarray(v["data"]), version))
                w.nn(vsizes[name])
                if version == 1:
                    w.u4(begins.get(name, 0))
                else:  # begin is INT64 in CDF-2 and CDF-5
                    w.parts.append(struct.pack(">Q", begins.get(name, 0)))
        else:
            w.u4(0)
            w.nn(0)
        return w.bytes()

    if version != 5:
        too_big = [n for n in order if vsizes[n] > 0xFFFFFFFF - 3]
        if too_big:
            # the spec's vsize escape value (2^32-1) would make the
            # record stride unrecoverable — require the wide format
            raise ValueError(
                f"variable(s) {too_big} overflow the 32-bit vsize field; "
                "pass version=5 (CDF-5)"
            )

    # pass 1 sizes the header (fixed-width offsets ⇒ length is stable),
    # pass 2 writes the real begin offsets
    hlen = len(header({}))
    begins: dict[str, int] = {}
    off = hlen
    for name in order:
        if name not in rec_vars:
            begins[name] = off
            off += vsizes[name]
    for name in rec_vars:
        begins[name] = off
        off += vsizes[name]
    if version == 1 and off + max(0, numrecs - 1) * recsize > 2**31 - 1:
        raise ValueError(
            "offsets overflow CDF-1's 31-bit begin field; pass version=2"
        )

    out = [header(begins)]
    for name in order:
        if name in rec_vars:
            continue
        v = vars_[name]
        arr = np.asarray(v["data"])
        raw = arr.astype(_DTYPE_OF_NC[_nc_type_of(arr, version)]).tobytes()
        out.append(raw + b"\x00" * (vsizes[name] - len(raw)))
    # big-endian copies made ONCE per variable; slabs slice [r:r+1] (not
    # [r]) because numpy scalar extraction silently drops byte order
    be = {
        name: np.ascontiguousarray(
            np.asarray(vars_[name]["data"]).astype(
                _DTYPE_OF_NC[
                    _nc_type_of(np.asarray(vars_[name]["data"]), version)
                ]
            )
        )
        for name in rec_vars
    }
    for r in range(numrecs):
        for name in rec_vars:
            raw = be[name][r:r + 1].tobytes()
            out.append(raw + b"\x00" * (vsizes[name] - len(raw)))
    return b"".join(out)


class _R:
    """Big-endian header reader (NON_NEG width follows the version)."""

    def __init__(self, data: bytes, version: int = 1) -> None:
        self.data = data
        self.off = 0
        self.version = version

    def u4(self) -> int:
        v = struct.unpack_from(">I", self.data, self.off)[0]
        self.off += 4
        return v

    def u8(self) -> int:
        v = struct.unpack_from(">Q", self.data, self.off)[0]
        self.off += 8
        return v

    def nn(self) -> int:
        return self.u8() if self.version == 5 else self.u4()

    def name(self) -> str:
        n = self.nn()
        s = self.data[self.off:self.off + n].decode("utf-8")
        self.off += _pad4(n)
        return s

    def attrs(self) -> dict:
        tag = self.u4()
        count = self.nn()
        if tag == 0 and count == 0:
            return {}
        if tag != _TAG_ATT:
            raise ValueError(f"bad attribute-list tag 0x{tag:x}")
        out = {}
        for _ in range(count):
            k = self.name()
            t = self.u4()
            _check_type_version(t, self.version)
            n = self.nn()
            nbytes = n * _SIZE_OF_NC[t]
            raw = self.data[self.off:self.off + nbytes]
            self.off += _pad4(nbytes)
            out[k] = _attr_value(t, n, raw)
        return out


def _check_magic(data: bytes) -> int:
    """→ 1/2/5 for the classic formats, 4 for the HDF5 container."""
    if data[:4] == b"\x89HDF":
        return 4
    if data[:3] != b"CDF":
        raise ValueError("not a NetCDF file (no CDF magic)")
    version = data[3]
    if version not in (1, 2, 5):
        raise ValueError(f"unknown CDF version byte {version}")
    return version


def _parse_header(data: bytes) -> dict:
    version = _check_magic(data)
    if version == 4:
        raise AssertionError(
            "internal: classic header parser reached with HDF5 bytes — "
            "callers route version 4 through nc4_decode"
        )
    r = _R(data, version)
    r.off = 4
    numrecs = r.nn()
    tag = r.u4()
    ndims = r.nn()
    dim_list: list[tuple[str, int]] = []
    if tag == _TAG_DIM:
        for _ in range(ndims):
            dim_list.append((r.name(), r.nn()))
    elif not (tag == 0 and ndims == 0):
        raise ValueError(f"bad dim-list tag 0x{tag:x}")
    gatts = r.attrs()
    tag = r.u4()
    nvars = r.nn()
    vars_: list[dict] = []
    if tag == _TAG_VAR:
        for _ in range(nvars):
            name = r.name()
            nd = r.nn()
            dimids = [r.nn() for _ in range(nd)]
            vatts = r.attrs()
            t = r.u4()
            _check_type_version(t, version)
            vsize = r.nn()
            begin = r.u4() if version == 1 else r.u8()
            vars_.append({"name": name, "dimids": dimids, "attrs": vatts,
                          "nc_type": t, "vsize": vsize, "begin": begin})
    elif not (tag == 0 and nvars == 0):
        raise ValueError(f"bad var-list tag 0x{tag:x}")
    rec_id = next((i for i, (_, n) in enumerate(dim_list) if n == 0), None)
    for v in vars_:
        v["is_rec"] = rec_id is not None and v["dimids"][:1] == [rec_id]
    rec_vars = [v for v in vars_ if v["is_rec"]]
    recsize = sum(v["vsize"] for v in rec_vars)
    streaming = _STREAMING64 if version == 5 else _STREAMING
    if numrecs == streaming:  # writer died mid-stream: derive from size
        if rec_vars:
            start = min(v["begin"] for v in rec_vars)
            numrecs = (len(data) - start) // recsize if recsize else 0
        else:
            numrecs = 0
    return {"version": version, "numrecs": numrecs, "dims": dim_list,
            "attrs": gatts, "vars": vars_, "rec_id": rec_id,
            "recsize": recsize, "header_len": r.off}


def nc_info(data: bytes) -> dict:
    """Header probe without touching variable data (the crawl-triage
    analog of functions/media.py): dims, per-var dtype/shape/attrs,
    global attrs, record count.  (For the HDF5 container the probe is
    derived from the full decode — the chunked layout has no cheap
    header-only path in this subset.)"""
    if _check_magic(data) == 4:
        ncds = nc4_decode(data)
        out_vars4 = {}
        for name, v in ncds["vars"].items():
            out_vars4[name] = {
                "dims": tuple(v["dims"]),
                "shape": tuple(np.asarray(v["data"]).shape),
                "attrs": v["attrs"],
                "dtype": str(np.asarray(v["data"]).dtype),
            }
        return {"version": 4, "numrecs": ncds["numrecs"],
                "dims": ncds["dims"], "vars": out_vars4,
                "attrs": ncds["attrs"]}
    h = _parse_header(data)
    dims = {n: (None if ln == 0 else ln) for n, ln in h["dims"]}
    out_vars = {}
    for v in h["vars"]:
        vdims = tuple(h["dims"][i][0] for i in v["dimids"])
        shape = tuple(
            h["numrecs"] if h["dims"][i][1] == 0 else h["dims"][i][1]
            for i in v["dimids"]
        )
        out_vars[v["name"]] = {
            "dims": vdims, "shape": shape, "attrs": v["attrs"],
            "dtype": str(np.dtype(_DTYPE_OF_NC[v["nc_type"]].newbyteorder("="))),
        }
    return {"version": h["version"], "numrecs": h["numrecs"], "dims": dims,
            "vars": out_vars, "attrs": h["attrs"]}


def nc_decode(data: bytes) -> dict:
    """NetCDF bytes → ncds dict (native-endian arrays).  Classic
    CDF-1/2/5 parse directly; ``\\x89HDF`` payloads route through the
    NETCDF4-classic reader (nc4_decode)."""
    if _check_magic(data) == 4:
        return nc4_decode(data)
    h = _parse_header(data)
    numrecs = h["numrecs"]
    dims = {n: (None if ln == 0 else ln) for n, ln in h["dims"]}
    out_vars: dict[str, dict] = {}
    for v in h["vars"]:
        vdims = tuple(h["dims"][i][0] for i in v["dimids"])
        dt = _DTYPE_OF_NC[v["nc_type"]]
        inner = tuple(h["dims"][i][1] for i in v["dimids"] if h["dims"][i][1] != 0)
        n_inner = int(np.prod(inner, dtype=np.int64)) if inner else 1
        if v["is_rec"]:
            if numrecs == 0:
                # fuzz-found: begin may sit at EOF with zero records and
                # ndarray-from-buffer rejects the (valid) empty view
                arr = np.empty((0,) + inner, dtype=dt)
            else:
                # stride over the interleaved record slabs — no
                # per-record python loop, one copy into a native-endian
                # array
                arr = np.ndarray(
                    shape=(numrecs, n_inner),
                    dtype=dt,
                    buffer=data,
                    offset=v["begin"],
                    strides=(h["recsize"], dt.itemsize),
                ).reshape((numrecs,) + inner)
        else:
            arr = np.frombuffer(
                data, dtype=dt, count=n_inner, offset=v["begin"]
            ).reshape(inner)
        out_vars[v["name"]] = {
            "dims": vdims,
            "data": np.ascontiguousarray(arr).astype(dt.newbyteorder("=")),
            "attrs": v["attrs"],
        }
    return {"dims": dims, "vars": out_vars, "attrs": h["attrs"],
            "numrecs": numrecs, "version": h["version"]}


def nc_append(data: bytes, ncds: dict) -> bytes:
    """Append records along the record dim (the reference's mode='a'
    unlimited-dim append, native/netcdf.py:354-358 + test_netcdf4.py:
    39-51): classic layout makes this new record slabs at EOF plus a
    numrecs patch — no rewrite of existing bytes.  The HDF5 container
    has no append-in-place in this codec's subset: version-4 payloads
    decode, concatenate along the record dim, and re-encode (same
    result bytes-for-values, different cost profile — documented)."""
    if _check_magic(data) == 4:
        return _nc4_append(data, ncds)
    h = _parse_header(data)
    rec_vars = [v for v in h["vars"] if v["is_rec"]]
    if not rec_vars:
        raise ValueError("file has no record dimension to append along")
    new_vars = ncds["vars"]
    got = {v["name"] for v in rec_vars}
    want = set(new_vars)
    n_new = None
    for v in rec_vars:
        if v["name"] not in new_vars:
            raise ValueError(f"append missing record variable {v['name']!r}")
        arr = np.asarray(new_vars[v["name"]]["data"])
        if _nc_type_of(arr, h["version"]) != v["nc_type"]:
            raise ValueError(
                f"append dtype mismatch for {v['name']!r}: file has "
                f"{np.dtype(_DTYPE_OF_NC[v['nc_type']])}, got {arr.dtype}"
            )
        inner = tuple(h["dims"][i][1] for i in v["dimids"][1:])
        if arr.shape[1:] != inner:
            raise ValueError(
                f"append shape mismatch for {v['name']!r}: file has "
                f"(rec,)+{inner}, got {arr.shape}"
            )
        if n_new is None:
            n_new = arr.shape[0]
        elif arr.shape[0] != n_new:
            raise ValueError("record variables disagree on appended count")
    extra = want - got
    if extra:
        raise ValueError(f"append carries unknown variables {sorted(extra)}")

    be = {
        v["name"]: np.ascontiguousarray(
            np.asarray(new_vars[v["name"]]["data"]).astype(
                _DTYPE_OF_NC[v["nc_type"]]
            )
        )
        for v in rec_vars
    }
    slabs: list[bytes] = []
    for r in range(n_new):
        for v in rec_vars:
            raw = be[v["name"]][r:r + 1].tobytes()
            slabs.append(raw + b"\x00" * (v["vsize"] - len(raw)))
    start = min(v["begin"] for v in rec_vars)
    end = start + h["numrecs"] * h["recsize"]
    if h["version"] == 5:  # numrecs is an 8-byte NON_NEG in CDF-5
        patched = struct.pack(">Q", h["numrecs"] + n_new)
        return data[:4] + patched + data[12:end] + b"".join(slabs)
    patched = struct.pack(">I", h["numrecs"] + n_new)
    return data[:4] + patched + data[8:end] + b"".join(slabs)


# ---- NETCDF4_CLASSIC: the classic model on the HDF5 container --------------

#: netcdf-c's marker NAME for a dimension without a coordinate variable
_NC4_DIM_MARKER = "This is a netCDF dimension but not a netCDF variable."
#: convention attributes that are container plumbing, not user metadata
_NC4_SPECIAL = ("CLASS", "NAME", "DIMENSION_LIST", "REFERENCE_LIST",
                "_Netcdf4Dimid", "_Netcdf4Coordinates")


def nc4_encode(ncds: dict, chunksizes: tuple | None = None) -> bytes:
    """ncds dict → NETCDF4_CLASSIC bytes: every dimension becomes an
    HDF5 dimension-scale dataset (CLASS/NAME/_Netcdf4Dimid attrs; the
    dim's coordinate variable IS the scale when one exists, else a
    netcdf-c-style phantom), data variables carry DIMENSION_LIST
    vlen-of-object-reference attrs, the unlimited dim maps to an
    unlimited maxshape with per-record chunking, and the root group is
    stamped with _NCProperties.  The classic DATA MODEL is enforced —
    types outside CDF-1's set are rejected exactly like nc_encode
    (that is what the _CLASSIC suffix means).

    ``chunksizes`` mirrors the reference's NetCdfXrFile(chunksizes=...)
    knob (native/netcdf.py chunking, pinned by its test_xarray.py
    chunksizes test): a tuple applied to every DATA variable whose rank
    matches (coordinate/dimension-scale variables keep their automatic
    single-chunk layout — same scope as the reference, which passes the
    knob to its data variables), each entry clamped to the dim's
    current size (unlimited dims excepted).  A chunk shape yielding
    more than 2048 chunks for some variable is rejected with a clear
    error (the writer's chunk-B-tree depth limit); None keeps the
    automatic per-record chunking, which always stays under it."""
    from veranda_spark.functions.hdf5 import h5_write

    dims = dict(ncds.get("dims", {}))
    order, rec_dim = _var_order(ncds)
    vars_ = ncds["vars"]

    numrecs = 0
    for name in order:
        v = vars_[name]
        arr = np.asarray(v["data"])
        _nc_type_of(arr, 1)  # classic-model type set only
        shape, is_rec = _per_record_shape(v, rec_dim)
        want = tuple(dims[d] for d in shape)
        got = arr.shape[1:] if is_rec else arr.shape
        if got != want:
            raise ValueError(
                f"variable {name!r}: data shape {arr.shape} does not "
                f"match dims {tuple(v['dims'])}"
            )
        if is_rec:
            if numrecs and arr.shape[0] != numrecs:
                raise ValueError(
                    f"record variables disagree on record count: "
                    f"{arr.shape[0]} vs {numrecs}"
                )
            numrecs = arr.shape[0]

    datasets: dict[str, dict] = {}
    dim_ids = {d: i for i, d in enumerate(dims)}
    for d, n in dims.items():
        cur = numrecs if n is None else n
        if d in vars_:
            v = vars_[d]
            if tuple(v["dims"]) != (d,):
                raise ValueError(
                    f"coordinate variable {d!r} must be 1-D over its own "
                    f"dim, got dims {tuple(v['dims'])}"
                )
            data = np.asarray(v["data"])
            attrs: dict[str, Any] = {
                **v.get("attrs", {}),
                "CLASS": "DIMENSION_SCALE", "NAME": d,
                "_Netcdf4Dimid": dim_ids[d],
            }
        else:
            data = np.zeros(cur, dtype="float32")
            attrs = {
                "CLASS": "DIMENSION_SCALE",
                "NAME": f"{_NC4_DIM_MARKER}{cur:10}",
                "_Netcdf4Dimid": dim_ids[d],
            }
        spec: dict[str, Any] = {"data": data, "attrs": attrs}
        if n is None:
            spec["maxshape"] = (None,)
            spec["chunks"] = (max(cur, 1),)
        datasets[d] = spec

    for name in order:
        if name in dims:
            continue
        v = vars_[name]
        data = np.asarray(v["data"])
        attrs = dict(v.get("attrs", {}))
        vdims = tuple(v["dims"])
        if vdims:
            attrs["DIMENSION_LIST"] = {"_kind": "dimlist",
                                       "refs": list(vdims)}
        spec = {"data": data, "attrs": attrs}
        is_rec_var = rec_dim is not None and vdims[:1] == (rec_dim,)
        if is_rec_var:
            spec["maxshape"] = (None,) + data.shape[1:]
        if chunksizes is not None and len(chunksizes) == data.ndim:
            # user-directed chunking (reference chunksizes knob) —
            # clamp to current extents except along the unlimited dim
            # (int() everywhere: a float entry would otherwise crash
            # deep in the struct packing — review r7 pass-2 #1)
            chunks = tuple(
                max(1, int(c) if (is_rec_var and i == 0)
                    else min(int(c), max(s, 1)))
                for i, (c, s) in enumerate(zip(chunksizes, data.shape))
            )
            n_chunks = 1
            for c, s in zip(chunks, data.shape):
                n_chunks *= -(-max(s, 1) // c)
            if n_chunks > 2048:
                raise ValueError(
                    f"chunksizes {tuple(chunksizes)} yields {n_chunks} "
                    f"chunks for variable {name!r} (> the writer's 2048 "
                    "per-dataset chunk-B-tree limit) — use larger chunks"
                )
            spec["chunks"] = chunks
        elif is_rec_var:
            # chunk depth scales with the stack so the writer's 2-level
            # chunk B-tree (≤2048 chunks/dataset) never caps the record
            # count (review r7 #5) — same shape readers see from real
            # netcdf-c files, which also chunk >1 record when large
            rec_chunk = max(1, -(-numrecs // 2048))
            spec["chunks"] = (rec_chunk,) + tuple(
                max(s, 1) for s in data.shape[1:]
            )
        datasets[name] = spec

    root = {
        **ncds.get("attrs", {}),
        "_NCProperties":
            "version=2,netcdf=veranda_spark,hdf5=veranda_spark.functions."
            "hdf5",
    }
    return h5_write(datasets, attrs=root)


def nc4_decode(data: bytes) -> dict:
    """NETCDF4_CLASSIC bytes → the same ncds dict nc_decode returns:
    dimension-scale datasets become dims (coordinate variables kept as
    vars, netcdf-c phantom markers dropped), DIMENSION_LIST object
    references (or the _Netcdf4Coordinates fallback) map data variables
    onto dim names, convention attrs are stripped, and the unlimited
    dim comes back as ``None`` with numrecs from the current extent."""
    from veranda_spark.functions.hdf5 import h5_read

    f = h5_read(data)
    addr_to_name = {ds["addr"]: n for n, ds in f["datasets"].items()}
    dimscales: dict[str, dict] = {}
    datavars: dict[str, dict] = {}
    for name, ds in f["datasets"].items():
        cls = ds["attrs"].get("CLASS")
        if isinstance(cls, str) and cls.rstrip("\x00 ") == "DIMENSION_SCALE":
            dimscales[name] = ds
        else:
            datavars[name] = ds

    def dim_order(item):
        n, ds = item
        did = ds["attrs"].get("_Netcdf4Dimid")
        return (0, int(did)) if did is not None else (1, n)

    dims: dict[str, int | None] = {}
    numrecs = 0
    for n, ds in sorted(dimscales.items(), key=dim_order):
        unlimited = bool(ds["maxshape"]) and ds["maxshape"][0] is None
        cur = int(ds["shape"][0]) if ds["shape"] else 0
        dims[n] = None if unlimited else cur
        if unlimited:
            numrecs = cur

    out_vars: dict[str, dict] = {}
    for n, ds in sorted(dimscales.items(), key=dim_order):
        name_attr = ds["attrs"].get("NAME", "")
        if isinstance(name_attr, str) and name_attr.startswith(
            _NC4_DIM_MARKER
        ):
            continue  # phantom dim: not a netCDF variable
        out_vars[n] = {
            "dims": (n,), "data": ds["data"],
            "attrs": {k: v for k, v in ds["attrs"].items()
                      if k not in _NC4_SPECIAL},
        }

    by_dimid = {
        int(ds["attrs"]["_Netcdf4Dimid"]): n
        for n, ds in dimscales.items()
        if ds["attrs"].get("_Netcdf4Dimid") is not None
    }
    for n, ds in datavars.items():
        rank = len(ds["shape"])
        dl = ds["attrs"].get("DIMENSION_LIST")
        if dl is not None:
            vdims = []
            for refs in dl:
                if not len(refs):
                    raise ValueError(f"{n!r}: empty DIMENSION_LIST element")
                a = int(refs[0])
                if a not in addr_to_name:
                    raise ValueError(
                        f"{n!r}: DIMENSION_LIST references object "
                        f"{a:#x} which is not a dataset in this file"
                    )
                vdims.append(addr_to_name[a])
            vdims = tuple(vdims)
        elif "_Netcdf4Coordinates" in ds["attrs"]:
            ids = np.asarray(ds["attrs"]["_Netcdf4Coordinates"]).ravel()
            vdims = tuple(by_dimid[int(i)] for i in ids)
        elif rank == 0:
            vdims = ()
        else:
            raise ValueError(
                f"variable {n!r} carries neither DIMENSION_LIST nor "
                "_Netcdf4Coordinates — dims cannot be mapped"
            )
        out_vars[n] = {
            "dims": vdims, "data": ds["data"],
            "attrs": {k: v for k, v in ds["attrs"].items()
                      if k not in _NC4_SPECIAL},
        }
        if vdims and dims.get(vdims[0], 0) is None:
            numrecs = int(ds["shape"][0])

    attrs = {k: v for k, v in f["attrs"].items() if k != "_NCProperties"}
    return {"dims": dims, "vars": out_vars, "attrs": attrs,
            "numrecs": numrecs, "version": 4}


def _nc4_append(data: bytes, ncds: dict) -> bytes:
    """mode='a' semantics on the HDF5 container: decode, concatenate
    along the record dim, re-encode.  Same validation surface as the
    classic in-place append."""
    cur = nc4_decode(data)
    rec = [d for d, n in cur["dims"].items() if n is None]
    if not rec:
        raise ValueError("file has no record dimension to append along")
    rd = rec[0]
    rec_vars = [n for n, v in cur["vars"].items()
                if tuple(v["dims"])[:1] == (rd,)]
    new_vars = ncds["vars"]
    extra = set(new_vars) - set(rec_vars)
    if extra:
        raise ValueError(f"append carries unknown variables {sorted(extra)}")
    n_new = None
    for n in rec_vars:
        if n not in new_vars:
            raise ValueError(f"append missing record variable {n!r}")
        arr = np.asarray(new_vars[n]["data"])
        old = np.asarray(cur["vars"][n]["data"])
        if arr.dtype != old.dtype:
            raise ValueError(
                f"append dtype mismatch for {n!r}: file has {old.dtype}, "
                f"got {arr.dtype}"
            )
        if arr.shape[1:] != old.shape[1:]:
            raise ValueError(
                f"append shape mismatch for {n!r}: file has "
                f"(rec,)+{old.shape[1:]}, got {arr.shape}"
            )
        if n_new is None:
            n_new = arr.shape[0]
        elif arr.shape[0] != n_new:
            raise ValueError("record variables disagree on appended count")
    for n in rec_vars:
        cur["vars"][n]["data"] = np.concatenate(
            [np.asarray(cur["vars"][n]["data"]),
             np.asarray(new_vars[n]["data"])]
        )
    return nc4_encode({"dims": cur["dims"], "vars": cur["vars"],
                       "attrs": cur["attrs"]})


# ---- time-units + coordinate semantics (reference writer contract) ---------

_UNITS_RE = re.compile(
    r"^\s*(seconds|minutes|hours|days)\s+since\s+"
    r"(\d{4}-\d{2}-\d{2})(?:[ T](\d{2}:\d{2}:\d{2}))?\s*$",
    re.IGNORECASE,
)
_UNIT_NS = {"seconds": 10**9, "minutes": 60 * 10**9,
            "hours": 3600 * 10**9, "days": 86400 * 10**9}


def _parse_units(units: str) -> tuple[int, np.datetime64]:
    m = _UNITS_RE.match(units)
    if not m:
        raise ValueError(
            f"unsupported time units {units!r} (want "
            "'<seconds|minutes|hours|days> since YYYY-MM-DD[ HH:MM:SS]')"
        )
    unit, day, clock = m.groups()
    epoch = np.datetime64(f"{day}T{clock}" if clock else day, "ns")
    return _UNIT_NS[unit.lower()], epoch


def encode_time(values: np.ndarray, units: str) -> np.ndarray:
    """datetime64 → float64 offsets in ``units`` (CF 'X since T', the
    reference's _encode_temporal_dim analog, native/netcdf.py:540-563)."""
    per, epoch = _parse_units(units)
    ns = np.asarray(values, dtype="datetime64[ns]").astype("int64")
    return (ns - epoch.astype("int64")) / per


def decode_time(values: np.ndarray, units: str) -> np.ndarray:
    """float offsets in ``units`` → datetime64[ns]."""
    per, epoch = _parse_units(units)
    ns = np.round(np.asarray(values, dtype="float64") * per).astype("int64")
    return (epoch.astype("int64") + ns).astype("datetime64[ns]")


def nc_xy_coords(
    geotrans: tuple, n_cols: int, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Pixel-center x/y coordinate vectors from a GDAL geotransform —
    bit-for-bit the reference's formula (native/netcdf.py:213-245,
    pinned by test_netcdf4.py:96-117, including its use of the
    same-axis index in the rotation term)."""
    gt = tuple(float(g) for g in geotrans)
    ci = 0.5 + np.arange(n_cols)
    ri = 0.5 + np.arange(n_rows)
    x = gt[0] + ci * gt[1] + ci * gt[2]
    y = gt[3] + ri * gt[4] + ri * gt[5]
    return x, y


#: grid-mapping variable name used by the stack writer (the reference
#: emits the same pair of attrs on its gm variable,
#: native/netcdf.py:261-311)
GM_VAR = "spatial_ref"


def nc_encode_stack(
    arrays: dict[str, np.ndarray],
    *,
    record_dim: str = "time",
    record_values: np.ndarray | None = None,
    time_units: str | None = None,
    geotrans: tuple | None = None,
    sref: str | None = None,
    var_attrs: dict[str, dict] | None = None,
    nodatavals: dict[str, float] | None = None,
    scale_factors: dict[str, float] | None = None,
    offsets: dict[str, float] | None = None,
    dtypes: dict[str, str] | None = None,
    attrs: dict | None = None,
    version: int = 1,
    chunksizes: tuple | None = None,
) -> bytes:
    """The ``NetCdf4File(mode='w').write(ds)`` analog: a (rec, y, x)
    multi-variable stack → classic NetCDF with time/y/x coordinate
    variables, CF scale/offset/_FillValue encoding per variable
    (encode_values — native/geotiff.py:389-398 contract shared with the
    TIFF sink) and a grid-mapping variable carrying the geotransform +
    CRS WKT/shorthand."""
    from veranda_spark.functions.codec import encode_values

    first = next(iter(arrays.values()))
    if first.ndim != 3:
        raise ValueError(f"stack arrays must be (rec, rows, cols), got {first.shape}")
    n_rec, n_rows, n_cols = first.shape
    for k, a in arrays.items():
        if a.shape != first.shape:
            raise ValueError(f"stack variables disagree on shape: {k}")

    var_attrs = var_attrs or {}
    nodatavals = nodatavals or {}
    scale_factors = scale_factors or {}
    offsets = offsets or {}
    dtypes = dtypes or {}

    dims = {record_dim: None, "y": n_rows, "x": n_cols}
    vars_: dict[str, dict] = {}

    if record_values is None:
        record_values = np.arange(n_rec, dtype="float64")
    rec_attrs: dict[str, Any] = {}
    if time_units is not None:
        rec_attrs["units"] = time_units
        record_values = encode_time(record_values, time_units)
    vars_[record_dim] = {
        "dims": (record_dim,),
        "data": np.asarray(record_values, dtype="float64"),
        "attrs": rec_attrs,
    }
    if geotrans is not None:
        x, y = nc_xy_coords(geotrans, n_cols, n_rows)
        vars_["x"] = {"dims": ("x",), "data": x, "attrs": {}}
        vars_["y"] = {"dims": ("y",), "data": y, "attrs": {}}
        gm_attrs: dict[str, Any] = {
            "GeoTransform": " ".join(repr(float(g)) for g in geotrans)
        }
        if sref is not None:
            gm_attrs["crs_wkt"] = sref
        vars_[GM_VAR] = {
            "dims": (), "data": np.zeros((), dtype="int32"), "attrs": gm_attrs
        }

    for name, arr in arrays.items():
        # Packing parity (pinned by test_netcdf4.py:17-25): scale/offset
        # carried as DATASET attrs are pass-through metadata — values
        # are stored verbatim and the scaling applies on auto_decode
        # read.  Only EXPLICIT writer params (scale_factors/offsets
        # kwargs, the reference's NetCdf4File(scale_factors=...) path)
        # CF-pack on write; explicit dtypes/nodatavals cast/fill only.
        a = var_attrs.get(name, {})
        explicit = name in scale_factors or name in offsets
        scale = scale_factors.get(name, 1)
        offset = offsets.get(name, 0)
        nodata = nodatavals.get(
            name, a.get("_FillValue", a.get("fill_value"))
        )
        dtype = dtypes.get(name, str(arr.dtype))
        if explicit:
            stored = encode_values(arr, nodata, scale, offset, dtype)
        elif str(arr.dtype) != dtype or name in nodatavals:
            stored = encode_values(arr, nodatavals.get(name), 1, 0, dtype)
        else:
            stored = arr
        out_attrs = dict(a)
        if explicit:
            if scale != 1:
                out_attrs["scale_factor"] = float(scale)
            if offset != 0:
                out_attrs["add_offset"] = float(offset)
        if nodata is not None and not any(
            k in out_attrs for k in ("_FillValue", "fill_value")
        ):
            out_attrs["_FillValue"] = (
                int(nodata) if np.dtype(dtype).kind in "iu" else float(nodata)
            )
        vars_[name] = {
            "dims": (record_dim, "y", "x"), "data": stored, "attrs": out_attrs
        }

    return nc_encode(
        {"dims": dims, "vars": vars_, "attrs": attrs or {}},
        version=version, chunksizes=chunksizes,
    )


def nc_decode_stack(data: bytes, auto_decode: bool = False) -> dict:
    """The ``NetCdf4File(mode='r').read()`` analog: decode + optionally
    apply CF unpacking per variable (x·scale_factor + add_offset with
    _FillValue→NaN — the reference's auto_decode contract pinned by
    test_netcdf4.py:17-35: scale+offset applied when present, fill-only
    variables returned verbatim).  Returns the ncds dict with 'time'
    decoded to datetime64 when the record coord carries CF units."""
    from veranda_spark.functions.codec import auto_decode as _auto

    ncds = nc_decode(data)
    for name, v in ncds["vars"].items():
        a = v["attrs"]
        # datetime-decode ONLY coordinate variables (1-D, named after
        # their own dim — the CF convention for the record coord).  A
        # DATA variable whose units happen to match the pattern (e.g. an
        # elapsed-seconds measurement with a scale_factor) must flow
        # into the CF unpacking below instead — decoding it as absolute
        # datetimes from still-packed values is doubly wrong (review r6
        # #3).
        is_coord = len(v["dims"]) == 1 and v["dims"][0] == name
        if is_coord and "units" in a and isinstance(
            a["units"], str
        ) and _UNITS_RE.match(a["units"]):
            v["data"] = decode_time(v["data"], a["units"])
            continue
        if not auto_decode or name == GM_VAR:
            continue
        scale = a.get("scale_factor", 1)
        offset = a.get("add_offset", 0)
        nodata = a.get("_FillValue", a.get("fill_value"))
        if scale != 1 or offset != 0:
            v["data"] = _auto(v["data"], nodata, scale, offset)
    return ncds


def nc_geotrans(data: bytes) -> tuple | None:
    """Recover the geotransform: the grid-mapping variable's
    GeoTransform attr when present, else derived from the x/y
    coordinate-variable spacing (axis-aligned only — coordinate vectors
    cannot express rotation, so a rot term requires the gm attr)."""
    info = nc_info(data)
    gm = info["vars"].get(GM_VAR)
    if gm is not None and "GeoTransform" in gm["attrs"]:
        parts = [float(p) for p in str(gm["attrs"]["GeoTransform"]).split()]
        if len(parts) != 6:
            raise ValueError(f"malformed GeoTransform attr: {gm['attrs']}")
        return tuple(parts)
    if "x" in info["vars"] and "y" in info["vars"]:
        ncds = nc_decode(data)
        x = np.asarray(ncds["vars"]["x"]["data"], dtype="float64")
        y = np.asarray(ncds["vars"]["y"]["data"], dtype="float64")
        if x.size < 2 or y.size < 2:
            return None
        psx = x[1] - x[0]
        psy = y[1] - y[0]
        return (x[0] - 0.5 * psx, psx, 0.0, y[0] - 0.5 * psy, 0.0, psy)
    return None
