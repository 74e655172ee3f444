"""Multimodal (image/audio/video) column plumbing.

Binary payloads are opaque `binary` columns with typed metadata; the
Spark-side plumbing — schemas, batch shapes, partitioning, UDF
signatures — is real and tested.  Formats the engine owns decode for
real: raw / png / dctq / TIFF family / baseline JFIF JPEG
(functions/jpeg.py).  Media codecs the env lacks (MP3, H.264) stay
gated: they raise NotImplementedError or, with ``fake=True``, produce a
deterministic synthetic decode so downstream stages stay testable.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from veranda_spark.functions.codec import decode_image, png_encode

FEATURES_SCHEMA = (
    "image_id string, w int, h int, mean_val double, std_val double, "
    "edge_energy double, histogram array<int>"
)


def _decode_any(row, fake: bool) -> np.ndarray:
    fmt = row.fmt
    if fmt in ("raw", "png", "dctq", "tiff", "tiff_lzw", "jpg", "jpeg"):
        arr = decode_image(row.bytes, fmt, int(row.h), int(row.w))
        # features operate on luma; collapse RGB decodes (BT.601)
        if arr.ndim == 3:
            arr = (
                0.299 * arr[..., 0] + 0.587 * arr[..., 1] + 0.114 * arr[..., 2]
            )
        return arr
    if fake:
        # deterministic fake decode keyed on payload hash (media libs absent)
        seed = np.frombuffer(row.bytes[:8].ljust(8, b"\0"), dtype=np.uint64)[0]
        rng = np.random.default_rng(int(seed))
        return rng.integers(0, 256, (int(row.h), int(row.w)), dtype=np.uint8)
    raise NotImplementedError(
        f"decode for fmt={fmt!r} requires a media codec library (not in this "
        "env).  Deliberately NOT hand-implemented: MP3/H.264 payload decode "
        "depends on thousands of tabulated spec constants (ISO 11172-3 "
        "Huffman tables B.7 + synthesis window B.3, CABAC tables) that this "
        "environment offers no reference decoder or ground-truth fixture to "
        "validate against — an unverifiable decoder would be worse than a "
        "loud gate.  Container METADATA (duration, bitrate, codec, "
        "dimensions) IS parsed for real: functions/media.py / "
        "extract_media_metadata."
    )


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Per-image feature extraction: mean/std, gradient edge energy and a
    16-bin histogram — Arrow-batched, one decode per image, pixels never
    leave the executor."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = _decode_any(row, fake).astype("float64")
                gy, gx = np.gradient(arr)
                hist = np.histogram(arr, bins=16, range=(0, 256))[0]
                rows.append(
                    (
                        row.image_id, int(row.w), int(row.h),
                        float(arr.mean()), float(arr.std()),
                        float(np.sqrt(gx**2 + gy**2).mean()),
                        [int(x) for x in hist],
                    )
                )
            yield pd.DataFrame(
                rows or None,
                columns=["image_id", "w", "h", "mean_val", "std_val", "edge_energy", "histogram"],
            )

    return df.mapInPandas(kernel, schema=FEATURES_SCHEMA)


RESIZED_SCHEMA = "image_id string, bytes binary, w int, h int, fmt string"


def resize(df: DataFrame, out_w: int, out_h: int, fake: bool = False) -> DataFrame:
    """Nearest-neighbor resize to (out_h, out_w), re-encoded as PNG."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys = None
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                arr = _decode_any(row, fake)
                h, w = arr.shape[:2]
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = arr[np.ix_(yi, xi)]
                rows.append((row.image_id, png_encode(small), out_w, out_h, "png"))
            yield pd.DataFrame(rows or None, columns=["image_id", "bytes", "w", "h", "fmt"])

    return df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "media_id string, frame_idx int, bytes binary, w int, h int, fmt string"


def sample_frames(df: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Video frame sampling plumbing: one input row (media_id, bytes,
    n_frames, w, h, fmt) → one output row per sampled frame.  Real video
    decode is stubbed (no codec library); with fake=True frames are
    deterministic synthetic arrays so the explode/partition shape is
    exercised end-to-end."""

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                n_frames = int(getattr(row, "n_frames", 1))
                for fi in range(0, n_frames, every_n):
                    if not fake:
                        raise NotImplementedError("video decode needs a codec lib")
                    seed = hash((row.media_id, fi)) & 0xFFFFFFFF
                    rng = np.random.default_rng(seed)
                    frame = rng.integers(0, 256, (int(row.h), int(row.w)), dtype=np.uint8)
                    rows.append(
                        (row.media_id, fi, png_encode(frame), int(row.w), int(row.h), "png")
                    )
            yield pd.DataFrame(
                rows or None,
                columns=["media_id", "frame_idx", "bytes", "w", "h", "fmt"],
            )

    return df.mapInPandas(kernel, schema=FRAMES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "audio_id string, rate int, duration_sec double, rms double, zcr double, "
    "spectral_centroid_hz double, peak double"
)


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Per-clip audio features over WAV payloads (real decode —
    functions/wav.py, no codec lib needed): duration, RMS, zero-crossing
    rate, spectral centroid, peak.  Arrow-batched, one decode per clip,
    samples never leave the executor.  Input rows: (audio_id, bytes,
    fmt='wav')."""
    from veranda_spark.functions.wav import audio_feature_vector, wav_decode

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                if row.fmt != "wav":
                    raise NotImplementedError(
                        f"audio decode for fmt={row.fmt!r} needs a codec lib"
                    )
                samples, rate = wav_decode(row.bytes)
                f = audio_feature_vector(samples, rate)
                rows.append((
                    row.audio_id, rate, f["duration_sec"], f["rms"],
                    f["zcr"], f["spectral_centroid_hz"], f["peak"],
                ))
            yield pd.DataFrame(
                rows or None,
                columns=["audio_id", "rate", "duration_sec", "rms", "zcr",
                         "spectral_centroid_hz", "peak"],
            )

    return df.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


MEDIA_METADATA_SCHEMA = (
    "media_id string, container string, valid boolean, duration_sec double, "
    "bitrate int, samplerate int, mode string, layer int, n_frames long, "
    "vbr boolean, brand string, n_tracks int, video_codec string, "
    "audio_codec string, width int, height int"
)


def extract_media_metadata(df: DataFrame) -> DataFrame:
    """Compressed-media metadata probe (round 4): MP3 frame-header walk
    and MP4 box-structure parse over opaque binary payloads — the
    curation stage a 100 TB crawl runs BEFORE deciding what to decode
    (duration/bitrate/codec/dimension stats, corrupt-stream detection).
    Real byte parsing (functions/media.py), no codec lib; PAYLOAD decode
    stays gated.  Input rows: (media_id, bytes, fmt in {'mp3','mp4'}).
    Arrow-batched, one parse per payload, bytes never leave the
    executor."""
    from veranda_spark.functions.media import probe_mp3, probe_mp4

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                b = bytes(row.bytes)
                if row.fmt == "mp3":
                    m = probe_mp3(b)
                    rows.append((
                        row.media_id, "mp3", m["valid"], m["duration_sec"],
                        m["bitrate"], m["samplerate"], m["mode"], m["layer"],
                        m["n_frames"], m["vbr"], None, None, None, None,
                        None, None,
                    ))
                elif row.fmt == "mp4":
                    m = probe_mp4(b)
                    rows.append((
                        row.media_id, "mp4", m["valid"], m["duration_sec"],
                        None, None, None, None, None, None, m["brand"],
                        m["n_tracks"], m["video_codec"], m["audio_codec"],
                        m["width"], m["height"],
                    ))
                else:
                    raise ValueError(
                        f"extract_media_metadata: fmt must be mp3|mp4, "
                        f"got {row.fmt!r}"
                    )
            yield pd.DataFrame(
                rows or None,
                columns=["media_id", "container", "valid", "duration_sec",
                         "bitrate", "samplerate", "mode", "layer",
                         "n_frames", "vbr", "brand", "n_tracks",
                         "video_codec", "audio_codec", "width", "height"],
            )

    return df.mapInPandas(kernel, schema=MEDIA_METADATA_SCHEMA)
