"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
batch UDFs over mapInPandas. The decode step itself is STUBBED (the
sandbox ships no image/audio codecs — see `_decode_image_stub`), but
everything Spark-side is real and tested: schema, partition-preserving
mapInPandas plumbing, batch shapes, and the deterministic fake decoder
that downstream stages exercise.

At 100 TB the shape matters more than the codec: payloads must NOT be
shuffled (decode before any groupBy, project metadata early, keep the
binary column out of wide stages) — these operators read payload
columns only inside mapInPandas and emit compact features.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


def attach_fake_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake media payloads for plumbing tests: a seeded
    byte blob + metadata derived from the id (arithmetic, reproducible)."""
    return df.withColumn(
        "media",
        F.struct(
            F.encode(F.concat(F.lit("IMG"), F.col(id_col).cast("string")), "UTF-8").alias("payload"),
            ((F.col(id_col) % 8) * 64 + 64).cast("int").alias("width"),
            ((F.col(id_col) % 5) * 64 + 64).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit("fake/raw").alias("format"),
        ),
    )


def _decode_image_stub(payload: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """STUB decoder: no real codecs in this container. Deterministic
    fake: a seeded gradient so downstream feature math is testable.
    Swap for PIL/cv2 `imdecode` on a cluster with codecs installed —
    the Spark-side plumbing does not change.
    """
    if payload is None:
        raise NotImplementedError("real image decode requires a codec library")
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0xFFFF
    y = np.arange(height, dtype=np.float32)[:, None]
    x = np.arange(width, dtype=np.float32)[None, :]
    base = (x + 2 * y + seed) % 256
    return np.repeat(base[:, :, None], channels, axis=2)


FEATURE_SCHEMA = (
    "doc_id long, width int, height int, mean_intensity double, "
    "std_intensity double, aspect double"
)


def extract_image_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas feature extraction: decode (stub) -> per-image stats.

    Batch shape: the UDF receives Arrow batches of (id, media struct),
    decodes each payload, and emits one compact feature row per image —
    the binary column never leaves the stage.
    """
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r["media"]
                img = _decode_image_stub(
                    m["payload"], int(m["width"]), int(m["height"]), int(m["channels"])
                )
                rows.append(
                    {
                        "doc_id": r[id_col],
                        "width": int(m["width"]),
                        "height": int(m["height"]),
                        "mean_intensity": float(img.mean()),
                        "std_intensity": float(img.std()),
                        "aspect": float(m["width"]) / float(m["height"]),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "mean_intensity", "std_intensity", "aspect"
            ])

    return df.select(id_col, "media").mapInPandas(op, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, target: int = 64, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize: decode (stub) -> nearest-neighbor downsample ->
    re-encode (raw bytes). Demonstrates the payload-in/payload-out batch
    shape real pipelines use."""
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r["media"]
                img = _decode_image_stub(
                    m["payload"], int(m["width"]), int(m["height"]), int(m["channels"])
                )
                ys = np.linspace(0, img.shape[0] - 1, target).astype(int)
                xs = np.linspace(0, img.shape[1] - 1, target).astype(int)
                small = img[ys][:, xs]
                rows.append(
                    {
                        "doc_id": r[id_col],
                        "width": target,
                        "height": target,
                        "payload": small.astype(np.uint8).tobytes(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "payload"])

    return df.select(id_col, "media").mapInPandas(op, RESIZE_SCHEMA)


VIDEO_META_SCHEMA = "n_frames int, fps double"
FRAME_SCHEMA = "doc_id long, frame_idx int, ts_sec double, payload binary"


def attach_fake_video(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake video payloads: byte blob + (n_frames, fps)."""
    return df.withColumn(
        "video",
        F.struct(
            F.encode(F.concat(F.lit("VID"), F.col(id_col).cast("string")), "UTF-8").alias("payload"),
            ((F.col(id_col) % 20) * 30 + 30).cast("int").alias("n_frames"),
            F.lit(30.0).alias("fps"),
        ),
    )


def sample_frames(df: DataFrame, k: int = 4, id_col: str = "doc_id", size: int = 8) -> DataFrame:
    """mapInPandas frame sampling: k evenly-spaced frames per video, one
    output row each (frame index, timestamp, raw frame bytes). The frame
    decode is the same stub seam as images — a real pipeline swaps in
    pyav/ffmpeg; the Spark batch shape (video-in, k compact frame rows
    out, payload never shuffled) is the part that matters at scale."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                v = r["video"]
                n, fps = int(v["n_frames"]), float(v["fps"])
                idxs = np.linspace(0, n - 1, min(k, n)).astype(int)
                for fi in idxs:
                    frame = _decode_image_stub(
                        bytes(v["payload"]) + int(fi).to_bytes(4, "little"),
                        size, size, 3,
                    )
                    rows.append(
                        {
                            "doc_id": r[id_col],
                            "frame_idx": int(fi),
                            "ts_sec": float(fi) / fps,
                            "payload": frame.astype(np.uint8).tobytes(),
                        }
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "ts_sec", "payload"])

    return df.select(id_col, "video").mapInPandas(op, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# audio: fully computable (no codec needed) — synthetic PCM in, numpy
# DSP features out, closed-form oracle-checkable
# ---------------------------------------------------------------------------

AUDIO_SR = 8000
AUDIO_SECONDS = 0.25  # 2000 samples; every tone below is integer-cycle


def attach_fake_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic PCM payloads: a pure tone per doc,
    f = 100 + (doc_id % 20) * 40 Hz (always integer cycles over the
    clip, so RMS is exactly amp/sqrt(2)), amp = 0.1 + (doc_id % 5)*0.1.
    Unlike images/video there is NO stub here — float32 PCM is just
    bytes, so the whole decode -> DSP path is real."""
    n = int(AUDIO_SR * AUDIO_SECONDS)

    @F.pandas_udf("binary")
    def synth(ids: pd.Series) -> pd.Series:
        t = np.arange(n, dtype=np.float64) / AUDIO_SR
        out = []
        for i in ids:
            f = 100.0 + (int(i) % 20) * 40.0
            amp = 0.1 + (int(i) % 5) * 0.1
            out.append((amp * np.sin(2.0 * np.pi * f * t)).astype(np.float32).tobytes())
        return pd.Series(out)

    return df.withColumn(
        "audio",
        F.struct(
            synth(F.col(id_col)).alias("payload"),
            F.lit(AUDIO_SR).alias("sample_rate"),
            F.lit(n).alias("n_samples"),
        ),
    )


AUDIO_FEATURE_SCHEMA = "doc_id long, rms double, dominant_hz double, zcr double"


def extract_audio_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas DSP: float32 PCM -> RMS, dominant frequency (argmax
    of the real FFT magnitude), zero-crossing rate. Payload bytes stay
    inside the stage; output is compact per-clip features."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                a = r["audio"]
                x = np.frombuffer(bytes(a["payload"]), dtype=np.float32).astype(np.float64)
                sr = int(a["sample_rate"])
                rms = float(np.sqrt(np.mean(x * x)))
                spec = np.abs(np.fft.rfft(x))
                spec[0] = 0.0  # ignore DC
                dom = float(np.argmax(spec) * sr / len(x))
                zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append(
                    {"doc_id": r[id_col], "rms": rms, "dominant_hz": dom, "zcr": zcr}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "rms", "dominant_hz", "zcr"])

    return df.select(id_col, "audio").mapInPandas(op, AUDIO_FEATURE_SCHEMA)
