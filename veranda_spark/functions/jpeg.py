"""Baseline JFIF (JPEG) codec in pure numpy — no external codec libs.

Closes the last format gate of the input_hint's ``fmt`` column: real
crawls are overwhelmingly JPEG.  The reference reads JPEG-compressed
rasters transparently through GDAL (native/geotiff.py:241-280); this
engine decodes baseline JFIF itself, the same dependency-free stance as
functions/tiff.py.

Scope (honest): baseline sequential DCT (SOF0), 8-bit samples, 1 or 3
components, sampling factors 1-2 (4:4:4 / 4:2:2 / 4:2:0), restart
markers, APPn/COM skipped.  Progressive (SOF2), arithmetic coding and
12-bit are rejected loudly.  The encoder exists so tests and fixtures
can craft real JFIF payloads deterministically (standard Annex K
quantization + huffman tables, IJG quality scaling); round-trip PSNR is
gated in tests.  Entropy decode is per-symbol Python over a 16-bit
lookup table — correct and fine at tile size; a production hot path
would sit behind the same ``decode_image`` dispatch.

The DCT matrix is shared with the dctq codec (functions/codec.py): the
orthonormal 8-point DCT-II *is* the JPEG FDCT (the 1/4·C(u)C(v) scaling
equals the orthonormal normalization), so both codecs provably use the
same transform.
"""

from __future__ import annotations

import struct

import numpy as np

from veranda_spark.functions.codec import _DCT8

# ---- constant tables (JPEG Annex K) -----------------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)

STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits-per-length[1..16], symbol values) — Annex K defaults
DC_LUMA_HUFF = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_HUFF = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_HUFF = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_HUFF = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], values: list[int]):
    """(symbol → (code, length)) for a JPEG canonical huffman table."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], values: list[int]):
    """16-bit-peek lookup arrays (symbol, code length) for fast decode."""
    sym = np.full(1 << 16, -1, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.uint8)
    for value, (code, length) in _canonical_codes(bits, values).items():
        shifted = code << (16 - length)
        span = 1 << (16 - length)
        sym[shifted: shifted + span] = value
        ln[shifted: shifted + span] = length
    return sym, ln


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality → quantization table scaling."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip(np.floor((base * scale + 50) / 100), 1, 255)


# ---- bit IO -----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
        # truncate drained bits: without this the accumulator grows by
        # every bit ever written and each shift goes quadratic on large
        # scans (a 512x512 noisy tile would take tens of seconds)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Reads the UNSTUFFED entropy-coded bytes of one restart segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def _peek16(self) -> int:
        byte = self.pos >> 3
        chunk = self.data[byte: byte + 4]
        v = int.from_bytes(chunk.ljust(4, b"\xff"), "big")
        return (v >> (16 - (self.pos & 7))) & 0xFFFF

    def read_symbol(self, sym: np.ndarray, ln: np.ndarray) -> int:
        peek = self._peek16()
        s = int(sym[peek])
        if s < 0:
            raise ValueError("invalid huffman code in JPEG stream")
        self.pos += int(ln[peek])
        return s

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = (self._peek16() >> (16 - n)) & ((1 << n) - 1)
        self.pos += n
        return v


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---- encoder ----------------------------------------------------------------


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_to(arr: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = arr.shape
    ph, pw = -h % bh, -w % bw
    if ph or pw:
        arr = np.pad(arr, ((0, ph), (0, pw)), mode="edge")
    return arr


def _forward_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (H, W multiples of 8) → quantized zigzag coeffs
    with shape (by, bx, 64), vectorized DCT over every block at once."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coef = np.einsum("ux,byxw,wv->byuv", _DCT8, blocks, _DCT8.T)
    quant = np.round(coef / q).astype(np.int32)
    return quant.reshape(h // 8, w // 8, 64)[:, :, ZIGZAG]


def _encode_block(
    writer: _BitWriter, zz: np.ndarray, pred: int,
    dc_codes: dict, ac_codes: dict,
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    cat = _category(diff)
    code, length = dc_codes[cat]
    writer.write(code, length)
    if cat:
        writer.write(diff if diff >= 0 else diff + (1 << cat) - 1, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        cat = _category(v)
        code, length = ac_codes[(run << 4) | cat]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << cat) - 1, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def jpeg_encode(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JFIF bytes."""
    if arr.dtype != np.uint8:
        raise ValueError(f"jpeg_encode needs uint8, got {arr.dtype}")
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError(f"jpeg_encode needs (h,w) or (h,w,3), got {arr.shape}")
    h, w = arr.shape[:2]
    lq = _quality_scale(STD_LUMA_Q, quality)
    cq = _quality_scale(STD_CHROMA_Q, quality)

    if gray:
        comps = [(1, (1, 1), 0)]  # (id, (h_samp, v_samp), q_table)
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        if subsampling == "4:2:0":
            samp = [(2, 2), (1, 1), (1, 1)]
        elif subsampling == "4:2:2":
            samp = [(2, 1), (1, 1), (1, 1)]
        elif subsampling == "4:4:4":
            samp = [(1, 1), (1, 1), (1, 1)]
        else:
            raise ValueError(f"unsupported subsampling {subsampling!r}")
        hmax = max(s[0] for s in samp)
        vmax = max(s[1] for s in samp)
        planes = []
        for ci, (sh, sv) in enumerate(samp):
            p = ycc[..., ci]
            fy, fx = vmax // sv, hmax // sh
            if fy > 1 or fx > 1:
                p = _pad_to(p, fy, fx)
                p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                    axis=(1, 3)
                )
            planes.append(p)
        comps = [(1, samp[0], 0), (2, samp[1], 1), (3, samp[2], 1)]

    hmax = max(c[1][0] for c in comps)
    vmax = max(c[1][1] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    qts = [lq, cq] if not gray else [lq]
    coefs = []
    for (cid, (sh, sv), qi), plane in zip(comps, planes):
        # pad the plane so it covers whole MCUs for this component
        need_h, need_w = mcuy * sv * 8, mcux * sh * 8
        padded = np.pad(
            plane,
            ((0, need_h - plane.shape[0]), (0, need_w - plane.shape[1])),
            mode="edge",
        )
        coefs.append(_forward_blocks(padded, qts[qi]))

    dc_tabs = [_canonical_codes(*DC_LUMA_HUFF)]
    ac_tabs = [_canonical_codes(*AC_LUMA_HUFF)]
    if not gray:
        dc_tabs.append(_canonical_codes(*DC_CHROMA_HUFF))
        ac_tabs.append(_canonical_codes(*AC_CHROMA_HUFF))

    writer = _BitWriter()
    preds = [0] * len(comps)
    scan = bytearray()
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                scan += bytes(writer.out)
                scan += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                writer = _BitWriter()
                preds = [0] * len(comps)
            for ci, (cid, (sh, sv), qi) in enumerate(comps):
                ti = 0 if qi == 0 else 1
                for by in range(sv):
                    for bx in range(sh):
                        zz = coefs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_tabs[ti], ac_tabs[ti]
                        )
            mcu_count += 1
    writer.flush()
    scan += bytes(writer.out)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qts):
        zz = q.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + zz.tobytes()
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, (sh, sv), qi in comps:
        sof += bytes([cid, (sh << 4) | sv, qi])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    huffs = [(0x00, DC_LUMA_HUFF), (0x10, AC_LUMA_HUFF)]
    if not gray:
        huffs += [(0x01, DC_CHROMA_HUFF), (0x11, AC_CHROMA_HUFF)]
    for tc_th, (bits, values) in huffs:
        body = bytes([tc_th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for ci, (cid, _, qi) in enumerate(comps):
        ti = 0 if qi == 0 else 1
        sos += bytes([cid, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---- decoder ----------------------------------------------------------------


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w) or (h, w, 3) array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_offset = -1

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2: pos + seglen]
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.frombuffer(seg, np.uint8, 64, o + 1).astype(np.float64)
                qtables[tq] = tab[UNZIGZAG].reshape(8, 8)
                o += 65
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                tc, th = seg[o] >> 4, seg[o] & 0xF
                bits = list(seg[o + 1: o + 17])
                n = sum(bits)
                values = list(seg[o + 17: o + 17 + n])
                htables[(tc, th)] = _decode_table(bits, values)
                o += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit JPEG supported")
            for i in range(nc):
                cid, samp, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append({
                    "id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq,
                })
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG coding (marker 0xFF{marker:02X}); "
                "only baseline sequential (SOF0/1) is implemented"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cid, tabs = seg[1 + 2 * i], seg[2 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0xF
            scan_offset = pos + seglen
            break
        pos += seglen
    if scan_offset < 0 or not comps:
        raise ValueError("no scan found in JPEG payload")

    # ---- collect entropy-coded segments, unstuff, split at restarts
    segments: list[bytes] = []
    cur = bytearray()
    p = scan_offset
    while p < len(data):
        b = data[p]
        if b != 0xFF:
            cur.append(b)
            p += 1
            continue
        nxt = data[p + 1] if p + 1 < len(data) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            p += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            p += 2
        else:  # EOI or next marker
            break
    segments.append(bytes(cur))

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bx"] = mcux * c["h"]
        c["by"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["by"], c["bx"], 64), dtype=np.float64)

    n_mcus = mcux * mcuy
    per_seg = restart_interval or n_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= n_mcus:
            break
        reader = _BitReader(seg_bytes)
        preds = {c["id"]: 0 for c in comps}
        for _ in range(min(per_seg, n_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for c in comps:
                dsym, dln = htables[(0, c["td"])]
                asym, aln = htables[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        cat = reader.read_symbol(dsym, dln)
                        diff = _extend(reader.read_bits(cat), cat)
                        preds[c["id"]] += diff
                        zz[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(asym, aln)
                            run, cat = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(cat), cat)
                            k += 1
                        c["coef"][my * c["v"] + by, mx * c["h"] + bx] = zz
            mcu += 1
    if mcu != n_mcus:
        raise ValueError(f"JPEG scan truncated: {mcu}/{n_mcus} MCUs")

    # ---- dequantize + vectorized IDCT per component
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        coef = c["coef"][:, :, UNZIGZAG].reshape(c["by"], c["bx"], 8, 8) * q
        pix = np.einsum("xu,byuv,vw->byxw", _DCT8.T, coef, _DCT8) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(c["by"] * 8, c["bx"] * 8)
        # upsample to full resolution (nearest), crop to (h, w)
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    if len(planes) == 3:
        return _ycbcr_to_rgb(*planes)
    raise ValueError(f"unsupported component count {len(planes)}")
