"""Baseline TIFF codec in pure numpy (no GDAL/PIL in this environment).

Closes round 1's top capability gap: the reference IS a GeoTIFF library
(GeoTiffFile.read, /root/reference/src/veranda/raster/native/geotiff.py:241-280)
and ``sniff_fmt`` labels payloads "tiff", but the engine could not decode
them.  This reader covers the reference's core storage layouts:

- classic TIFF, little- or big-endian
- strip AND tile organization
- compression: none (1), LZW (5), Deflate (8 and legacy 32946, stdlib
  zlib) and PackBits (32773), with horizontal predictor (2)
- sample types: uint8/uint16 (SampleFormat 1), int16/int32 (2) and
  float32/float64 (3) — the reference's common sigma0/backscatter dtypes;
  1 sample/pixel (grey) or N interleaved samples

The writer emits single-strip uncompressed or LZW little-endian TIFF —
enough to round-trip tests and to exercise the LZW decode path with
self-produced payloads.  Decode is whole-array numpy except the LZW
token loop, which is per-code by nature (and runs inside Arrow-batched
pandas UDFs like every other codec here).
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids
_W, _H, _BITS, _COMP, _PHOTO = 256, 257, 258, 259, 262
_STRIP_OFF, _SPP, _ROWS_PER_STRIP, _STRIP_CNT = 273, 277, 278, 279
_PREDICTOR, _SFMT = 317, 339
_TILE_W, _TILE_H, _TILE_OFF, _TILE_CNT = 322, 323, 324, 325

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd(data: bytes, bo: str) -> dict[int, list]:
    (ifd_off,) = struct.unpack(bo + "I", data[4:8])
    (n,) = struct.unpack(bo + "H", data[ifd_off : ifd_off + 2])
    tags: dict[int, list] = {}
    for i in range(n):
        e = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", data[e : e + 8])
        if typ not in _TYPE_FMT:
            continue
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (off,) = struct.unpack(bo + "I", data[e + 8 : e + 12])
            raw = data[off : off + size]
        tags[tag] = list(struct.unpack(bo + str(cnt) + _TYPE_FMT[typ], raw))
    return tags


# ---- TIFF-variant LZW -------------------------------------------------------
# MSB-first bit packing, 9->12-bit codes, Clear=256, EOI=257, "early change"
# (code width bumps one entry before the table is full) — the layout GDAL
# and libtiff write.


def lzw_decode(data: bytes, expected: int | None = None) -> bytes:
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table
        table = [bytes([i]) for i in range(256)] + [b"", b""]

    reset()
    bitbuf = 0
    nbits = 0
    width = 9
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == 256:  # Clear
            reset()
            width = 9
            prev = None
            continue
        if code == 257:  # EOI
            return bytes(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change, one entry behind the encoder: the encoder widens
        # after assigning code 2^w - 1, so the decoder (whose table lags
        # by one add) must widen when its table reaches 2^w - 2
        if len(table) >= (1 << width) - 2 and width < 12:
            width += 1
        if expected is not None and len(out) >= expected:
            return bytes(out)


def lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9

    def emit(code: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(256)  # Clear
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code >= 4094:
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)  # EOI
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def packbits_decode(data: bytes, expected: int | None = None) -> bytes:
    """Apple PackBits (TIFF compression 32773): n in [0,127] copies n+1
    literal bytes; n in [-127,-1] repeats the next byte 1-n times; -128
    is a no-op."""
    out = bytearray()
    pos, n = 0, len(data)
    while pos < n:
        c = data[pos]
        pos += 1
        if c == 128:
            continue
        if c < 128:
            out += data[pos : pos + c + 1]
            pos += c + 1
        else:
            out += bytes([data[pos]]) * (257 - c)
            pos += 1
        if expected is not None and len(out) >= expected:
            break
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: emit runs >=3 as repeats, else literal spans."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal span: until a >=3 run starts or 128 bytes collected
        j = i + 1
        while j < n and j - i < 128:
            run = 1
            while j + run < n and run < 3 and data[j + run] == data[j]:
                run += 1
            if run >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _undo_predictor(arr: np.ndarray) -> np.ndarray:
    # horizontal differencing: cumulative sum along rows, per sample plane
    return np.cumsum(arr.astype(np.int64), axis=1).astype(arr.dtype)


def tiff_decode(data: bytes) -> np.ndarray:
    """TIFF payload → (h, w) or (h, w, spp) uint8/uint16 array."""
    if data[:2] == b"II" and data[2:4] == b"*\x00":
        bo = "<"
    elif data[:2] == b"MM" and data[2:4] == b"\x00*":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    t = _read_ifd(data, bo)
    w = int(t[_W][0])
    h = int(t[_H][0])
    bits = int(t.get(_BITS, [8])[0])
    comp = int(t.get(_COMP, [1])[0])
    spp = int(t.get(_SPP, [1])[0])
    pred = int(t.get(_PREDICTOR, [1])[0])
    sfmt = int(t.get(_SFMT, [1])[0])
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression={comp} (none/LZW/Deflate/PackBits)"
        )
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None or (kind, bits) not in {
        ("u", 8), ("u", 16), ("i", 16), ("i", 32), ("f", 32), ("f", 64),
    }:
        raise NotImplementedError(f"TIFF SampleFormat={sfmt} bits={bits}")
    if pred == 2 and kind == "f":
        raise NotImplementedError("predictor 2 on float samples")
    dt = np.dtype(f"{bo}{kind}{bits // 8}")
    bpp = (bits // 8) * spp

    def segment(off: int, cnt: int, seg_h: int, seg_w: int) -> np.ndarray:
        raw = data[off : off + cnt]
        if comp == 5:
            raw = lzw_decode(raw, expected=seg_h * seg_w * bpp)
        elif comp in (8, 32946):
            import zlib

            raw = zlib.decompress(raw)
        elif comp == 32773:
            raw = packbits_decode(raw, expected=seg_h * seg_w * bpp)
        arr = np.frombuffer(raw[: seg_h * seg_w * bpp], dtype=dt)
        arr = arr.reshape(seg_h, seg_w, spp) if spp > 1 else arr.reshape(seg_h, seg_w)
        if pred == 2:
            arr = _undo_predictor(arr)
        return arr

    if _TILE_OFF in t:  # tiled layout
        tw, th_ = int(t[_TILE_W][0]), int(t[_TILE_H][0])
        offs, cnts = t[_TILE_OFF], t[_TILE_CNT]
        across = (w + tw - 1) // tw
        down = (h + th_ - 1) // th_
        shape = (down * th_, across * tw, spp) if spp > 1 else (down * th_, across * tw)
        out = np.zeros(shape, dtype=dt)
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(i, across)
            out[ty * th_ : (ty + 1) * th_, tx * tw : (tx + 1) * tw] = segment(
                int(off), int(cnt), th_, tw
            )
        out = out[:h, :w]
    else:  # strips
        rps = int(t.get(_ROWS_PER_STRIP, [h])[0])
        offs, cnts = t[_STRIP_OFF], t[_STRIP_CNT]
        parts = []
        for i, (off, cnt) in enumerate(zip(offs, cnts)):
            seg_h = min(rps, h - i * rps)
            parts.append(segment(int(off), int(cnt), seg_h, w))
        out = np.concatenate(parts, axis=0)
    return np.ascontiguousarray(out.astype(dt.newbyteorder("=")))


def tiff_encode(arr: np.ndarray, compression: str = "none") -> bytes:
    """(h, w) or (h, w, spp) uint8/uint16 → single-strip little-endian
    TIFF.  compression: 'none' or 'lzw'."""
    arr = np.asarray(arr)
    kinds = {"u": 1, "i": 2, "f": 3}
    ok = {("u", 1), ("u", 2), ("i", 2), ("i", 4), ("f", 4), ("f", 8)}
    if (arr.dtype.kind, arr.dtype.itemsize) not in ok:
        raise ValueError(
            f"tiff_encode supports uint8/16, int16/32, float32/64 (got {arr.dtype})"
        )
    sfmt = kinds[arr.dtype.kind]
    if arr.ndim == 2:
        h, w = arr.shape
        spp = 1
    else:
        h, w, spp = arr.shape
    bits = arr.dtype.itemsize * 8
    payload = np.ascontiguousarray(arr.astype("<" + arr.dtype.str[1:])).tobytes()
    comp = 1
    if compression == "lzw":
        payload = lzw_encode(payload)
        comp = 5
    elif compression == "deflate":
        import zlib

        payload = zlib.compress(payload, 6)
        comp = 8
    elif compression == "packbits":
        payload = packbits_encode(payload)
        comp = 32773
    elif compression != "none":
        raise ValueError(f"compression {compression!r}")

    entries = [
        (_W, 3, 1, w),
        (_H, 3, 1, h),
        (_BITS, 3, 1, bits),
        (_COMP, 3, 1, comp),
        (_PHOTO, 3, 1, 1),  # BlackIsZero
        (_STRIP_OFF, 4, 1, 0),  # patched below
        (_SPP, 3, 1, spp),
        (_ROWS_PER_STRIP, 3, 1, h),
        (_STRIP_CNT, 4, 1, len(payload)),
        (_SFMT, 3, 1, sfmt),
    ]
    header = struct.pack("<2sHI", b"II", 42, 8)
    ifd = struct.pack("<H", len(entries))
    data_off = 8 + 2 + 12 * len(entries) + 4
    for tag, typ, cnt, val in entries:
        if tag == _STRIP_OFF:
            val = data_off
        ifd += struct.pack("<HHII", tag, typ, cnt, val)
    ifd += struct.pack("<I", 0)  # no next IFD
    return header + ifd + payload
