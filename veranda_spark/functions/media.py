"""Compressed-media METADATA probes: MP3 (MPEG audio) frame headers and
MP4 (ISO-BMFF) box structure — pure-python byte parsing, no codec libs.

Why probes and not decoders: full Layer III PCM decode and H.264 decode
depend on ~2500 tabulated constants from the standards (Huffman tables
ISO 11172-3 B.7, synthesis window B.3, CABAC tables) that cannot be
validated in this environment — there is no reference decoder and no
ground-truth fixture to check a from-memory transcription against, so a
"decoder" would be unverifiable; those stay honestly gated in
sources/multimodal.py.  The STRUCTURE layer below (sync words, header
fields, bitrate/samplerate tables, box walking) is small, fully
specified, and verifiable against hand-crafted bytes — and it is what a
100 TB curation pipeline runs over a crawl FIRST: duration/bitrate/codec
/dimension stats decide what ever gets decoded.

Reference scope note: veranda is raster-only (no audio/video); these
extend the engine's multimodal side the same way functions/wav.py does.

MPEG audio facts used (ISO 11172-3 / 13818-3 public header layout):
frame sync 11 bits; version 00=2.5 10=2 11=1; layer 01=III 10=II 11=I;
bitrate/samplerate index tables below; frame bytes = 12*br/sr*4 (L1) or
144*br/sr (L2, L3v1) or 72*br/sr (L3v2/2.5), + padding; samples/frame
384 (L1), 1152 (L2, L3v1), 576 (L3v2/2.5).
"""

from __future__ import annotations

import struct

# bitrate kbps by [version-group][layer][index]; index 0 = free, 15 = bad
_BR_V1 = {
    1: (0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    2: (0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    3: (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320),
}
_BR_V2 = {
    1: (0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    2: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    3: (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
_SR = {
    1: (44100, 48000, 32000),     # MPEG-1
    2: (22050, 24000, 16000),     # MPEG-2
    25: (11025, 12000, 8000),     # MPEG-2.5
}
_MODES = ("stereo", "joint_stereo", "dual_channel", "mono")


def _syncsafe(b: bytes) -> int:
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def parse_mp3_frame_header(b: bytes, off: int) -> dict | None:
    """Parse one MPEG audio frame header at ``off``; None if not a valid
    sync/header."""
    if off + 4 > len(b):
        return None
    h = struct.unpack(">I", b[off:off + 4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    ver_bits = (h >> 19) & 3
    layer_bits = (h >> 17) & 3
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 3
    if ver_bits == 1 or layer_bits == 0 or br_idx in (0, 15) or sr_idx == 3:
        return None  # reserved / free-format / bad
    version = {0: 25, 2: 2, 3: 1}[ver_bits]
    layer = {1: 3, 2: 2, 3: 1}[layer_bits]
    bitrate = (_BR_V1 if version == 1 else _BR_V2)[layer][br_idx] * 1000
    samplerate = _SR[version][sr_idx]
    padding = (h >> 9) & 1
    mode = _MODES[(h >> 6) & 3]
    if layer == 1:
        frame_bytes = (12 * bitrate // samplerate + padding) * 4
        samples = 384
    elif layer == 2 or version == 1:
        frame_bytes = 144 * bitrate // samplerate + padding
        samples = 1152
    else:  # Layer III, MPEG-2/2.5: half-size granule
        frame_bytes = 72 * bitrate // samplerate + padding
        samples = 576
    return {
        "version": version, "layer": layer, "bitrate": bitrate,
        "samplerate": samplerate, "mode": mode, "padding": padding,
        "crc": not ((h >> 16) & 1), "frame_bytes": frame_bytes,
        "samples": samples,
    }


def probe_mp3(b: bytes, max_frames: int = 1_000_000) -> dict:
    """Walk an MPEG audio stream: ID3v2 skip, frame chain, Xing/Info VBR
    header, duration estimate.  Returns a flat metadata dict (all fields
    None/0 when no frame syncs).

    Robustness: a false sync (0xFFEx inside payload bytes) is rejected
    by requiring the NEXT frame to sync exactly at frame_bytes — the
    standard two-frame validation."""
    off = 0
    id3_size = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        id3_size = 10 + _syncsafe(b[6:10])
        if b[5] & 0x10:  # footer present
            id3_size += 10
        off = id3_size
    # find first validated sync
    first = None
    while off < len(b) - 4:
        h = parse_mp3_frame_header(b, off)
        if h is not None:
            nxt = off + h["frame_bytes"]
            if nxt + 4 > len(b) or parse_mp3_frame_header(b, nxt) is not None:
                first = h
                break
        off += 1
    if first is None:
        return {"valid": False, "n_frames": 0, "duration_sec": None,
                "bitrate": None, "samplerate": None, "mode": None,
                "layer": None, "version": None, "vbr": None,
                "id3v2_bytes": id3_size, "xing_frames": None}
    # Xing/Info VBR header sits after the side info of the first frame
    side = (17 if first["mode"] == "mono" else 32) if first["version"] == 1 \
        else (9 if first["mode"] == "mono" else 17)
    tag_off = off + 4 + (2 if first["crc"] else 0) + side
    xing_frames = None
    vbr = None
    tag = b[tag_off:tag_off + 4]
    # truncated streams (the walk deliberately accepts a cut-off final
    # frame) must degrade to metadata-absent, never raise
    if tag in (b"Xing", b"Info") and tag_off + 8 <= len(b):
        vbr = tag == b"Xing"
        flags = struct.unpack(">I", b[tag_off + 4:tag_off + 8])[0]
        if flags & 1 and tag_off + 12 <= len(b):
            xing_frames = struct.unpack(">I", b[tag_off + 8:tag_off + 12])[0]
    # frame walk
    n_frames = 0
    br_sum = 0
    pos = off
    while pos + 4 <= len(b) and n_frames < max_frames:
        h = parse_mp3_frame_header(b, pos)
        if h is None:
            break
        n_frames += 1
        br_sum += h["bitrate"]
        pos += h["frame_bytes"]
    total_frames = xing_frames if xing_frames else n_frames
    duration = total_frames * first["samples"] / first["samplerate"]
    return {
        "valid": True, "n_frames": n_frames,
        "duration_sec": round(duration, 6),
        "bitrate": br_sum // max(n_frames, 1),
        "samplerate": first["samplerate"], "mode": first["mode"],
        "layer": first["layer"], "version": first["version"],
        "vbr": vbr if vbr is not None else False,
        "id3v2_bytes": id3_size, "xing_frames": xing_frames,
    }


# ---- MP4 / ISO base media file format (boxes) -------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"udta"}


def _walk_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each box in
    [start, end); handles 64-bit largesize and stops cleanly on a
    truncated/invalid size."""
    off = start
    while off + 8 <= end:
        size = struct.unpack(">I", b[off:off + 4])[0]
        btype = b[off + 4:off + 8]
        payload = off + 8
        if size == 1:
            if off + 16 > end:
                return
            size = struct.unpack(">Q", b[off + 8:off + 16])[0]
            payload = off + 16
        elif size == 0:
            size = end - off  # box extends to end of enclosing scope
        if size < 8 or off + size > end:
            return
        yield btype, payload, off + size
        off += size


def probe_mp4(b: bytes) -> dict:
    """Parse ISO-BMFF structure: brand, movie duration, per-track
    handler/codec, video dimensions.  Returns a flat metadata dict
    (valid=False when no ftyp/moov parses)."""
    out = {
        "valid": False, "brand": None, "duration_sec": None,
        "timescale": None, "n_tracks": 0, "video_codec": None,
        "audio_codec": None, "width": None, "height": None,
    }
    have_struct = False
    for btype, p, e in _walk_boxes(b, 0, len(b)):
        if btype == b"ftyp" and e - p >= 4:
            out["brand"] = b[p:p + 4].decode("latin1")
            have_struct = True
        elif btype == b"moov":
            have_struct = True
            for t2, p2, e2 in _walk_boxes(b, p, e):
                if t2 == b"mvhd":
                    # bounds are per-VERSION (v1 reads to p2+32) and must
                    # stay inside THIS box — a truncated/corrupt mvhd
                    # degrades to no-duration, and must never read the
                    # following box's bytes as timescale/duration
                    ver = b[p2] if e2 > p2 else 0
                    if ver == 1 and e2 - p2 >= 32:
                        ts = struct.unpack(">I", b[p2 + 20:p2 + 24])[0]
                        dur = struct.unpack(">Q", b[p2 + 24:p2 + 32])[0]
                    elif ver == 0 and e2 - p2 >= 20:
                        ts = struct.unpack(">I", b[p2 + 12:p2 + 16])[0]
                        dur = struct.unpack(">I", b[p2 + 16:p2 + 20])[0]
                    else:
                        continue
                    out["timescale"] = ts
                    if ts:
                        out["duration_sec"] = round(dur / ts, 6)
                elif t2 == b"trak":
                    out["n_tracks"] += 1
                    _probe_trak(b, p2, e2, out)
    out["valid"] = have_struct
    return out


def _probe_trak(b: bytes, start: int, end: int, out: dict) -> None:
    handler = None
    codec = None
    width = height = None
    for t, p, e in _walk_boxes(b, start, end):
        if t == b"tkhd" and e - p >= 4:
            ver = b[p]
            # width/height are the LAST two 16.16 fixed-point fields
            if e - p >= 8:
                width = struct.unpack(">I", b[e - 8:e - 4])[0] / 65536.0
                height = struct.unpack(">I", b[e - 4:e])[0] / 65536.0
        elif t == b"mdia":
            for t2, p2, e2 in _walk_boxes(b, p, e):
                if t2 == b"hdlr" and e2 - p2 >= 12:
                    handler = b[p2 + 8:p2 + 12].decode("latin1")
                elif t2 == b"minf":
                    for t3, p3, e3 in _walk_boxes(b, p2, e2):
                        if t3 == b"stbl":
                            for t4, p4, e4 in _walk_boxes(b, p3, e3):
                                if t4 == b"stsd" and e4 - p4 >= 16:
                                    # version+flags(4) count(4) then
                                    # first entry: size(4) fourcc(4)
                                    codec = b[p4 + 12:p4 + 16].decode(
                                        "latin1"
                                    )
    if handler == "vide":
        out["video_codec"] = codec
        if width:
            out["width"] = int(width)
        if height:
            out["height"] = int(height)
    elif handler == "soun":
        out["audio_codec"] = codec


# ---- deterministic fixture builders (tests + queries) -----------------------


def build_mp3_bytes(
    n_frames: int = 10,
    bitrate_idx: int = 9,
    sr_idx: int = 0,
    mode_idx: int = 3,
    with_id3: bool = True,
    with_xing: bool = False,
    xing_frames: int | None = None,
) -> bytes:
    """A structurally valid MPEG-1 Layer III stream: real headers, real
    frame sizes, deterministic filler payloads.  This is the fixture
    half of the probe (audio PAYLOAD decode stays gated —
    sources/multimodal.py)."""
    out = bytearray()
    if with_id3:
        tag_body = b"TXXX" + b"\x00" * 7  # minimal fake frame body
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(tag_body) >> 21) & 0x7F, (len(tag_body) >> 14) & 0x7F,
             (len(tag_body) >> 7) & 0x7F, len(tag_body) & 0x7F]
        ) + tag_body
    sr = _SR[1][sr_idx]
    br = _BR_V1[3][bitrate_idx] * 1000
    for i in range(n_frames):
        padding = 0
        h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
            | (bitrate_idx << 12) | (sr_idx << 10) | (padding << 9) \
            | (mode_idx << 6)
        frame_bytes = 144 * br // sr + padding
        frame = bytearray(struct.pack(">I", h))
        body = bytearray((frame_bytes - 4))
        if i == 0 and with_xing:
            side = 17 if mode_idx == 3 else 32
            body[side:side + 4] = b"Xing"
            body[side + 4:side + 8] = struct.pack(">I", 1)
            body[side + 8:side + 12] = struct.pack(
                ">I", xing_frames if xing_frames is not None else n_frames
            )
        else:
            for j in range(len(body)):
                body[j] = (i * 31 + j * 7) % 251  # deterministic, < 0xFF:
                # filler never contains a 0xFF sync byte
        frame += body
        out += frame
    return bytes(out)


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def build_mp4_bytes(
    duration_sec: float = 12.5,
    timescale: int = 1000,
    width: int = 640,
    height: int = 360,
    video_codec: str = "avc1",
    audio_codec: str = "mp4a",
) -> bytes:
    """A structurally valid minimal MP4: ftyp + moov(mvhd, video trak,
    audio trak) + a small mdat.  Sample tables are empty — structure
    only, matching what the probe reads."""
    dur = int(round(duration_sec * timescale))
    mvhd = b"\x00" + b"\x00\x00\x00" + struct.pack(
        ">IIII", 0, 0, timescale, dur
    ) + b"\x00" * 80
    def trak(handler: str, codec: str, w: int, h: int) -> bytes:
        tkhd = b"\x00" + b"\x00\x00\x07" + struct.pack(
            ">IIIII", 0, 0, 1, 0, dur
        ) + b"\x00" * 52 + struct.pack(">II", w << 16, h << 16)
        hdlr = b"\x00\x00\x00\x00" + b"\x00\x00\x00\x00" \
            + handler.encode() + b"\x00" * 12 + b"\x00"
        entry = struct.pack(">I", 8) + codec.encode("latin1")
        stsd = b"\x00\x00\x00\x00" + struct.pack(">I", 1) + entry
        stbl = _box(b"stsd", stsd)
        minf = _box(b"stbl", stbl)
        mdia = _box(b"hdlr", hdlr) + _box(b"minf", minf)
        return _box(
            b"trak", _box(b"tkhd", tkhd) + _box(b"mdia", mdia)
        )
    moov = _box(b"mvhd", mvhd) \
        + trak("vide", video_codec, width, height) \
        + trak("soun", audio_codec, 0, 0)
    return _box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isomiso2") \
        + _box(b"moov", moov) + _box(b"mdat", b"\x00" * 64)
