"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The training-data-pipeline extension surface (BASELINE north star; not in the
reference, which is tabular-only — SURVEY.md §1.1). Design:

* Media travels as a ``binary`` column plus a typed ``meta`` struct — the
  lakehouse treats it like any other column (parquet stores binary natively;
  file stats/pruning apply to the metadata fields).
* Decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` operators: pixels never pass through the JVM row-at-a-time
  path, and each task processes a whole record batch with numpy.
* The container has no image/audio libraries, so the codec here is **FAKEMEDIA,
  a deterministic synthetic format** (numpy-packed headers + payload) standing
  in for JPEG/PCM/MP4 — the STUB boundary. ``decode_external`` marks where a
  real codec (PIL/soundfile/av) plugs in; everything Spark-side (schemas,
  batch shapes, partitioning, UDF signatures) is real and tested.

Scale notes: media rows are wide (MBs each) — operators repartition by
``media_id`` so batches stay balanced, and ``spark.sql.files.maxPartitionBytes``
governs scan parallelism. Feature extraction is embarrassingly parallel; the
only shuffle in this module is the optional repartition.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# meta is a typed struct so it stays queryable/prunable without decoding data
MEDIA_SCHEMA = (
    "media_id bigint, kind string, data binary, "
    "meta struct<width:int, height:int, channels:int, sample_rate:int, "
    "n_frames:int, format:string>"
)

_IMG_MAGIC = b"FIMG"
_AUD_MAGIC = b"FAUD"
_VID_MAGIC = b"FVID"


# --------------------------------------------------------------------------
# FAKEMEDIA codec (numpy; deterministic in media_id)
# --------------------------------------------------------------------------
def _pack_image(arr: np.ndarray) -> bytes:
    h, w, c = arr.shape
    return _IMG_MAGIC + struct.pack("<III", w, h, c) + arr.astype(np.uint8).tobytes()


def _unpack_image(b: bytes) -> np.ndarray:
    if b[:4] != _IMG_MAGIC:
        raise ValueError("not a FIMG payload")
    w, h, c = struct.unpack("<III", b[4:16])
    return np.frombuffer(b, np.uint8, count=w * h * c, offset=16).reshape(h, w, c)


def _pack_audio(samples: np.ndarray, rate: int) -> bytes:
    return _AUD_MAGIC + struct.pack("<II", rate, len(samples)) + samples.astype(
        "<i2"
    ).tobytes()


def _unpack_audio(b: bytes):
    if b[:4] != _AUD_MAGIC:
        raise ValueError("not a FAUD payload")
    rate, n = struct.unpack("<II", b[4:12])
    return np.frombuffer(b, "<i2", count=n, offset=12), rate


def _pack_video(frames: np.ndarray) -> bytes:
    n, h, w, c = frames.shape
    return _VID_MAGIC + struct.pack("<IIII", n, w, h, c) + frames.astype(
        np.uint8
    ).tobytes()


def _unpack_video(b: bytes) -> np.ndarray:
    if b[:4] != _VID_MAGIC:
        raise ValueError("not a FVID payload")
    n, w, h, c = struct.unpack("<IIII", b[4:20])
    return np.frombuffer(b, np.uint8, count=n * w * h * c, offset=20).reshape(
        n, h, w, c
    )


def decode_external(b: bytes, fmt: str):
    """The real-codec plug point (JPEG/PNG/WAV/MP4...). Image/audio libraries
    are not available in this environment — STUB by design."""
    raise NotImplementedError(
        f"real {fmt!r} decoding needs an external codec (PIL/soundfile/av); "
        "wire it here — all Spark-side plumbing is codec-agnostic"
    )


# --------------------------------------------------------------------------
# dataset synthesis (deterministic fake corpus over any id column)
# --------------------------------------------------------------------------
def synth_media(ids_df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic FAKEMEDIA payload to every id: kind cycles
    image/audio/video; content follows a CLOSED-FORM pattern in (id, offset)
    — flat element i of an image/video is ``(id*31 + 7*i) % 256``, audio
    sample i is ``((id*131 + 11*i) % 16384) - 8192``. Closed form (rather
    than a seeded RNG) so downstream features are re-derivable by plain SQL:
    the driver's DuckDB oracle recomputes them from the spec (m01/m02), and
    tests assert exact values."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf[id_col].astype("int64"):
                mid = int(mid)
                kind = ("image", "audio", "video")[mid % 3]
                if kind == "image":
                    w, h, c = 32 + mid % 32, 24 + mid % 24, 3
                    vals = (
                        mid * 31 + 7 * np.arange(h * w * c, dtype=np.int64)
                    ) % 256
                    data = _pack_image(vals.astype(np.uint8).reshape(h, w, c))
                    meta = (w, h, c, None, None, "fimg")
                elif kind == "audio":
                    rate, n = 16000, 1600 + mid % 800
                    s = (
                        (mid * 131 + 11 * np.arange(n, dtype=np.int64)) % 16384
                    ) - 8192
                    data = _pack_audio(s.astype("<i2"), rate)
                    meta = (None, None, None, rate, None, "faud")
                else:
                    nf, w, h, c = 4 + mid % 5, 16, 12, 3
                    vals = (
                        mid * 31
                        + 7 * np.arange(nf * h * w * c, dtype=np.int64)
                    ) % 256
                    data = _pack_video(
                        vals.astype(np.uint8).reshape(nf, h, w, c)
                    )
                    meta = (w, h, c, None, nf, "fvid")
                rows.append((mid, kind, data, meta))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "data", "meta"]
            )

    n_part = ids_df.sparkSession.sparkContext.defaultParallelism
    return (
        ids_df.select(id_col)
        .repartition(n_part, id_col)  # balance wide rows across tasks
        .mapInPandas(gen, MEDIA_SCHEMA)
    )


# --------------------------------------------------------------------------
# operators (each: mapInPandas, numpy-vectorized per record batch)
# --------------------------------------------------------------------------
IMAGE_FEATURES_SCHEMA = (
    "media_id bigint, width int, height int, channels int, "
    "mean_intensity double, std_intensity double"
)


def image_features(media: DataFrame) -> DataFrame:
    """Decode + per-channel feature extraction for image rows.

    Stats are derived from EXACT integer sums (s1=Σx, s2=Σx², both < 2^53)
    and then a fixed sequence of IEEE double ops — mean = s1/n,
    std = sqrt(n·s2 − s1²)/n — so any engine recomputing from the same
    pixels (e.g. the driver's DuckDB oracle) gets bit-identical doubles;
    a float accumulation would differ in the last ulp by summation order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["kind"] != "image":
                    continue
                arr = _unpack_image(bytes(r["data"]))
                a = arr.astype(np.int64)
                n, s1, s2 = a.size, int(a.sum()), int((a * a).sum())
                out.append(
                    (
                        int(r["media_id"]),
                        arr.shape[1],
                        arr.shape[0],
                        arr.shape[2],
                        s1 / n,
                        float(np.sqrt(float(n * s2 - s1 * s1))) / n,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "width", "height", "channels",
                    "mean_intensity", "std_intensity",
                ],
            )

    return media.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbour resize; returns the same MEDIA_SCHEMA with updated
    payload + meta. (A real pipeline swaps the numpy kernel for PIL — the
    operator shape is identical.)"""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["kind"] != "image":
                    rows.append(
                        (int(r["media_id"]), r["kind"], bytes(r["data"]),
                         r["meta"])
                    )
                    continue
                arr = _unpack_image(bytes(r["data"]))
                h, w, _ = arr.shape
                yi = (np.arange(out_h) * h // out_h).astype(int)
                xi = (np.arange(out_w) * w // out_w).astype(int)
                out = arr[np.ix_(yi, xi)]
                rows.append(
                    (
                        int(r["media_id"]), "image", _pack_image(out),
                        (out_w, out_h, arr.shape[2], None, None, "fimg"),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "data", "meta"]
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id bigint, sample_rate int, n_samples int, duration_s double, "
    "rms double"
)


def audio_features(media: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["kind"] != "audio":
                    continue
                samples, rate = _unpack_audio(bytes(r["data"]))
                # exact Σs² then sqrt(s2/n): bit-identical when recomputed
                # by SQL (see image_features)
                s = samples.astype(np.int64)
                n, s2 = len(s), int((s * s).sum())
                out.append(
                    (
                        int(r["media_id"]), rate, n,
                        n / rate,
                        float(np.sqrt(s2 / n)) if n else 0.0,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "duration_s", "rms"
                ],
            )

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


FRAME_SCHEMA = (
    "media_id bigint, frame_index int, width int, height int, "
    "mean_intensity double"
)


def sample_frames(media: DataFrame, k: int = 2) -> DataFrame:
    """Evenly sample k frames per video row; one output row per frame
    (explode happens inside the batch — no JVM-side array materialization of
    raw pixels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                frames = _unpack_video(bytes(r["data"]))
                n = frames.shape[0]
                for idx in (np.arange(k) * n // k).astype(int):
                    fr = frames[idx].astype(np.int64)
                    # exact Σ then /size: bit-identical under SQL recompute
                    out.append(
                        (
                            int(r["media_id"]), int(idx), fr.shape[1],
                            fr.shape[0], int(fr.sum()) / fr.size,
                        )
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "frame_index", "width", "height",
                    "mean_intensity",
                ],
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
