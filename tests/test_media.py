"""MP3/MP4 metadata probes: hand-crafted container goldens + Spark leg.

The probes parse real container STRUCTURE (sync walk, bitrate tables,
ISO-BMFF boxes); payload decode stays gated (sources/multimodal.py).
"""

import os
import struct

import pytest

from veranda_spark.functions.media import (
    build_mp3_bytes,
    build_mp4_bytes,
    parse_mp3_frame_header,
    probe_mp3,
    probe_mp4,
)


def test_mp3_header_fields_golden():
    # hand-assembled header: MPEG-1 Layer III, 192 kbps (idx 11),
    # 48 kHz (idx 1), padding 1, joint stereo (mode 01)
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) \
        | (11 << 12) | (1 << 10) | (1 << 9) | (1 << 6)
    got = parse_mp3_frame_header(struct.pack(">I", h), 0)
    assert got == {
        "version": 1, "layer": 3, "bitrate": 192000, "samplerate": 48000,
        "mode": "joint_stereo", "padding": 1, "crc": False,
        "frame_bytes": 144 * 192000 // 48000 + 1, "samples": 1152,
    }
    # reserved samplerate index rejected
    bad = (0x7FF << 21) | (3 << 19) | (1 << 17) | (3 << 10) | (9 << 12)
    assert parse_mp3_frame_header(struct.pack(">I", bad), 0) is None


def test_mp3_stream_walk_and_false_sync():
    b = build_mp3_bytes(n_frames=6, bitrate_idx=9, sr_idx=0, mode_idx=3)
    m = probe_mp3(b)
    assert m["valid"] and m["n_frames"] == 6
    assert m["bitrate"] == 128000 and m["samplerate"] == 44100
    assert abs(m["duration_sec"] - 6 * 1152 / 44100) < 1e-6
    # a false 0xFFFB sync planted BEFORE the stream must be rejected by
    # the two-frame validation (next "frame" would not sync)
    junk = b"\x00\x12" + struct.pack(">I", (0x7FF << 21) | (3 << 19)
                                     | (1 << 17) | (9 << 12)) + b"\x07" * 40
    m2 = probe_mp3(junk + b)
    assert m2["valid"] and m2["n_frames"] == 6
    assert m2["samplerate"] == 44100


def test_mp3_xing_and_id3():
    b = build_mp3_bytes(n_frames=3, with_id3=True, with_xing=True,
                        xing_frames=250)
    m = probe_mp3(b)
    assert m["vbr"] is True and m["xing_frames"] == 250
    assert m["id3v2_bytes"] > 0
    assert abs(m["duration_sec"] - 250 * 1152 / 44100) < 1e-6
    assert not probe_mp3(b"\x01\x02" * 64)["valid"]


def test_mp4_box_golden_and_64bit_size():
    b = build_mp4_bytes(duration_sec=7.25, timescale=600, width=1920,
                        height=1080, video_codec="hev1")
    m = probe_mp4(b)
    assert m["valid"] and m["brand"] == "isom"
    assert m["duration_sec"] == 7.25 and m["timescale"] == 600
    assert m["n_tracks"] == 2
    assert m["video_codec"] == "hev1" and m["audio_codec"] == "mp4a"
    assert (m["width"], m["height"]) == (1920, 1080)
    # 64-bit largesize box wrapping the same moov still parses
    moov_start = b.index(b"moov") - 4
    moov_size = struct.unpack(">I", b[moov_start:moov_start + 4])[0]
    moov = b[moov_start:moov_start + moov_size]
    big = b[:moov_start] + struct.pack(">I", 1) + b"moov" \
        + struct.pack(">Q", 16 + (moov_size - 8)) + moov[8:] \
        + b[moov_start + moov_size:]
    m2 = probe_mp4(big)
    assert m2["duration_sec"] == 7.25 and m2["width"] == 1920
    # truncated box sizes fail cleanly, never raise
    assert probe_mp4(b[: len(b) // 3])["valid"] in (True, False)


REAL_MP3 = "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3"


@pytest.mark.skipif(not os.path.exists(REAL_MP3),
                    reason="no real-world mp3 present in this environment")
def test_mp3_real_world_file():
    # read-only probe of a third-party LAME-encoded MPEG-2 file that
    # happens to ship in the sandbox: validates the version-2 tables and
    # ID3 skip against bytes we did not craft ourselves
    with open(REAL_MP3, "rb") as f:
        m = probe_mp3(f.read())
    assert m["valid"] and m["layer"] == 3 and m["version"] == 2
    assert m["samplerate"] in (22050, 24000, 16000)
    assert m["n_frames"] > 10 and 0.5 < m["duration_sec"] < 60


def test_media_metadata_spark_leg(spark):
    from veranda_spark.fixtures import generate_media
    from veranda_spark.functions.media import build_mp3_bytes as _  # noqa: F401
    from veranda_spark.sources.multimodal import extract_media_metadata

    media = generate_media(spark, 60)
    out = extract_media_metadata(media).collect()
    assert len(out) == 60
    by_id = {r["media_id"]: r for r in out}
    assert all(r["valid"] for r in out)
    mp3s = [r for r in out if r["container"] == "mp3"]
    mp4s = [r for r in out if r["container"] == "mp4"]
    assert len(mp3s) == 30 and len(mp4s) == 30
    # spot-check against the driver-side probe on the same fixture bytes
    from veranda_spark.functions.media import build_mp4_bytes, probe_mp4

    i = 7  # odd -> mp4
    want = probe_mp4(build_mp4_bytes(
        duration_sec=1.0 + (i % 60), timescale=(600, 1000, 90000)[i % 3],
        width=160 + 16 * (i % 50), height=90 + 9 * (i % 50),
        video_codec=("avc1", "hev1", "av01")[i % 3],
    ))
    got = by_id[f"media_{i:08d}"]
    assert got["duration_sec"] == want["duration_sec"]
    assert got["video_codec"] == want["video_codec"]
    assert (got["width"], got["height"]) == (want["width"], want["height"])


def test_truncated_streams_never_raise():
    # review r4: corrupt-stream detection is the probe's job — truncation
    # anywhere must degrade, never raise
    mp3 = build_mp3_bytes(n_frames=3, with_xing=True)
    for cut in range(0, len(mp3), 7):
        m = probe_mp3(mp3[:cut])
        assert isinstance(m, dict)
    mp4 = build_mp4_bytes()
    for cut in range(0, len(mp4), 5):
        m = probe_mp4(mp4[:cut])
        assert isinstance(m, dict)


def test_mvhd_version1_bounds_and_no_cross_box_read():
    # a version-1 mvhd needs 32 payload bytes; a short one followed by
    # another box must NOT read the next box's bytes as timescale
    short_mvhd = b"\x01" + b"\x00" * 23  # v1, payload 24 < 32
    from veranda_spark.functions.media import _box as box

    trak_junk = box(b"trak", b"\xde\xad\xbe\xef" * 8)
    moov = box(b"moov", box(b"mvhd", short_mvhd) + trak_junk)
    m = probe_mp4(box(b"ftyp", b"isom\x00\x00\x02\x00") + moov)
    assert m["valid"] is True
    assert m["duration_sec"] is None and m["timescale"] is None
    # a WELL-FORMED v1 mvhd parses
    import struct as _s

    v1 = b"\x01" + b"\x00\x00\x00" + b"\x00" * 16 + _s.pack(">I", 1000) \
        + _s.pack(">Q", 2500) + b"\x00" * 76
    m2 = probe_mp4(box(b"moov", box(b"mvhd", v1)))
    assert m2["timescale"] == 1000 and m2["duration_sec"] == 2.5
