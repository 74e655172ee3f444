"""Pixel codecs: raw + minimal PNG, and the scale/offset/nodata decode.

Re-expresses veranda's per-band encode/decode contract
(reference native/geotiff.py:322-400 `_read_band`/`_write_band`,
native/netcdf.py:486-491, mosaic/geotiff.py:716-724):

- ``auto_decode``: ``x * scale_factor + add_offset`` with float promotion
  and nodata→NaN (native/geotiff.py:354-357)
- ``encode``: inverse ``(x - offset) / scale`` cast back to storage dtype
- custom decoder/encoder callables — here plain Python callables applied
  inside Arrow-batched pandas UDFs (the input_hint mandates no per-row
  Python; all kernels below are NumPy whole-array ops).

PNG support is a self-contained pure-numpy implementation (no PIL in this
environment): 8-bit greyscale / RGB / RGBA, zlib DEFLATE, scanline filters
0-4 supported on decode, filter 0 on encode.  Deterministic bytes.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """Encode a (h, w) or (h, w, c) uint8 array as a PNG (filter 0, zlib-6)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # scanlines, each prefixed with filter byte 0
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def png_decode(data: bytes) -> np.ndarray:
    """Decode an 8-bit PNG to (h, w) or (h, w, c) uint8. Supports color
    types 0/2/4/6, bit depth 8, no interlace, filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, 0
    idat = bytearray()
    h = c = 0
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG variant")
            c = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = w * c
    raw = raw.reshape(h, 1 + stride)
    filters = raw[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    if not filters.any():  # fast path: all filter 0 (our encoder)
        out[:] = raw[:, 1:]
    else:
        for y in range(h):
            line = raw[y, 1:].copy()
            f = filters[y]
            prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
            if f == 0:
                out[y] = line
            elif f == 2:  # Up
                out[y] = line + prev
            else:  # Sub/Average/Paeth need sequential pixel recurrence
                cur = np.zeros(stride, dtype=np.uint8)
                for i in range(stride):
                    a = cur[i - c] if i >= c else np.uint8(0)
                    b = prev[i]
                    cc = prev[i - c] if i >= c else np.uint8(0)
                    if f == 1:
                        cur[i] = line[i] + a
                    elif f == 3:
                        cur[i] = line[i] + np.uint8((int(a) + int(b)) // 2)
                    elif f == 4:
                        cur[i] = line[i] + _paeth(
                            np.uint8(a), np.uint8(b), np.uint8(cc)
                        )
                out[y] = cur
    arr = out.reshape(h, w, c)
    return arr[:, :, 0] if c == 1 else arr


# ---- lossy DCT-quantization codec ("dctq") ---------------------------------
# A self-contained lossy format for exercising the PSNR>=40dB invariant
# (input_hint) without external codec libraries: 8x8 block DCT-II,
# uniform quantization, zlib entropy stage.  Deterministic; NOT a JPEG —
# real jpg payloads decode through functions/jpeg.py (baseline JFIF).

_DCT8 = np.array(
    [[np.cos((2 * x + 1) * u * np.pi / 16) * (np.sqrt(0.125) if u == 0 else 0.5)
      for x in range(8)] for u in range(8)]
)


def _blocks(arr: np.ndarray) -> tuple[np.ndarray, int, int]:
    h, w = arr.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(arr, ((0, ph), (0, pw)), mode="edge").astype("float64")
    H, W = padded.shape
    return (
        padded.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3),
        h, w,
    )


def lossy_encode(arr: np.ndarray, q: float | None = None) -> bytes:
    """(h, w) uint8/uint16 → dctq payload.  q is the uniform quantization
    step; the default (4 per 8-bit dynamic-range unit) keeps PSNR well
    above 40 dB on natural and noise images at either depth.  The dtype is
    carried in the header so decode is self-describing (round-2 extension
    for the reference's uint16 fixtures, native/netcdf.py dtypes)."""
    arr = np.asarray(arr)
    if arr.ndim != 2 or arr.dtype not in (np.dtype("uint8"), np.dtype("uint16")):
        raise ValueError("dctq supports 2-D uint8/uint16")
    is16 = arr.dtype == np.uint16
    if q is None:
        q = 4.0 * (257.0 if is16 else 1.0)
    center = 32768.0 if is16 else 128.0
    blocks, h, w = _blocks(arr.astype("float64") - center)
    coef = np.einsum("ux,byxw,wv->byuv", _DCT8, blocks, _DCT8.T)
    quant = np.round(coef / q).astype("int32" if is16 else "int16")
    head = struct.pack("<IIfB", h, w, q, 1 if is16 else 0)
    return b"DCTQ" + head + zlib.compress(quant.tobytes(), 6)


def lossy_decode(data: bytes) -> np.ndarray:
    if data[:4] != b"DCTQ":
        raise ValueError("not a dctq payload")
    h, w, q, code = struct.unpack("<IIfB", data[4:17])
    is16 = code == 1
    H, W = h + (-h) % 8, w + (-w) % 8
    quant = np.frombuffer(
        zlib.decompress(data[17:]), dtype="int32" if is16 else "int16"
    ).reshape(H // 8, W // 8, 8, 8)
    coef = quant.astype("float64") * q
    blocks = np.einsum("xu,byuv,vw->byxw", _DCT8.T, coef, _DCT8)
    center, peak = (32768.0, 65535) if is16 else (128.0, 255)
    full = blocks.transpose(0, 2, 1, 3).reshape(H, W) + center
    out = np.clip(np.round(full), 0, peak)
    return out.astype("uint16" if is16 else "uint8")[:h, :w]


# ---- format dispatch ------------------------------------------------------


#: formats whose encode→decode round trip is bit-exact (PSNR gates and
#: dtype guards only apply to truly lossy codecs)
LOSSLESS_FMTS = {"raw", "png", "tiff", "tiff_lzw", "tiff_deflate", "tiff_packbits", "cog"}


def encode_image(arr: np.ndarray, fmt: str, geo=None) -> bytes:
    """Array → payload bytes.  'raw' = C-order bytes of the storage dtype
    (shape carried by the table's w/h columns); 'png' = lossless PNG.
    ``geo`` = (ul_x, ul_y, psx, psy) embeds GeoTIFF placement tags on the
    TIFF-family formats (ignored elsewhere)."""
    if fmt == "raw":
        return np.ascontiguousarray(arr).tobytes()
    if fmt == "png":
        return png_encode(arr)
    if fmt == "dctq":
        return lossy_encode(arr)
    if fmt == "tiff":
        from veranda_spark.functions.tiff import tiff_encode

        return tiff_encode(arr, geo=geo)
    if fmt in ("tiff_lzw", "tiff_deflate", "tiff_packbits"):
        from veranda_spark.functions.tiff import tiff_encode

        return tiff_encode(arr, compression=fmt[5:], geo=geo)
    if fmt == "cog":
        from veranda_spark.functions.tiff import tiff_encode_cog

        return tiff_encode_cog(arr, geo=geo)
    if fmt in ("jpg", "jpeg"):
        from veranda_spark.functions.jpeg import jpeg_encode

        # quality 95: keeps even the noisiest fixture images above the
        # input_hint's PSNR>=40dB lossy invariant
        return jpeg_encode(arr, quality=95)
    raise NotImplementedError(f"fmt {fmt!r}")


def decode_image(
    data: bytes, fmt: str, h: int, w: int, channels: int = 1, dtype=np.uint8
) -> np.ndarray:
    """Payload bytes → (h, w) or (h, w, c) array."""
    if fmt == "raw":
        arr = np.frombuffer(data, dtype=dtype)
        shape = (h, w) if channels == 1 else (h, w, channels)
        return arr.reshape(shape)
    if fmt == "png":
        return png_decode(data)
    if fmt == "dctq":
        return lossy_decode(data)
    if fmt in ("tiff", "tiff_lzw", "tiff_deflate", "tiff_packbits", "cog"):
        from veranda_spark.functions.tiff import tiff_decode

        return tiff_decode(data)
    if fmt in ("jpg", "jpeg"):
        from veranda_spark.functions.jpeg import jpeg_decode

        return jpeg_decode(data)
    if fmt == "zip":
        # zip-container read (reference /vsizip/ path, native/geotiff.py:
        # 137-149): unwrap the first member and re-sniff its format
        import io
        import zipfile

        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = zf.namelist()
            if not names:
                raise ValueError("empty zip payload")
            inner = zf.read(names[0])
        if inner[:8] == _PNG_SIG:
            return png_decode(inner)
        if inner[:2] in (b"II", b"MM"):
            from veranda_spark.functions.tiff import tiff_decode

            return tiff_decode(inner)
        if inner[:3] == b"\xff\xd8\xff":
            from veranda_spark.functions.jpeg import jpeg_decode

            return jpeg_decode(inner)
        return decode_image(inner, "raw", h, w, channels, dtype)
    raise NotImplementedError(f"fmt {fmt!r}")


# ---- scale/offset/nodata value semantics ----------------------------------


def auto_decode(
    arr: np.ndarray,
    nodataval: float | int | None = None,
    scale_factor: float = 1.0,
    add_offset: float = 0.0,
    dtype: str = "float64",
) -> np.ndarray:
    """veranda auto-decode (native/geotiff.py:354-357): promote to float,
    nodata→NaN, then x*scale+offset."""
    out = arr.astype(dtype)
    if nodataval is not None:
        out[arr == nodataval] = np.nan
    return out * scale_factor + add_offset


def encode_values(
    arr: np.ndarray,
    nodataval: float | int | None = None,
    scale_factor: float = 1.0,
    add_offset: float = 0.0,
    dtype: str = "uint8",
) -> np.ndarray:
    """Inverse of auto_decode (native/geotiff.py:389-398 writer contract):
    (x - offset) / scale, NaN→nodata, cast to storage dtype."""
    out = (np.asarray(arr, dtype="float64") - add_offset) / scale_factor
    if nodataval is not None:
        out = np.where(np.isnan(out), nodataval, out)
    return out.astype(dtype)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (input_hint: PSNR>=40dB for lossy)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0.0:
        return float("inf")
    return 10.0 * np.log10(peak * peak / mse)
