"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as `binary` columns with a metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow
batch UDFs over mapInPandas. Uncompressed formats (24-bit BMP, binary
PPM/P6, float32 PCM) are encoded AND decoded for real in pure numpy —
no codec library needed — so the whole payload->features path executes
end-to-end and is value-exact against a closed-form oracle. Compressed
formats (JPEG/PNG/H.264) are the one seam left: `decode_image` raises
NotImplementedError on an unknown magic — swap in PIL/cv2/pyav there on
a cluster that ships codecs; nothing Spark-side changes.

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
from pyspark.sql import types as T
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "width int, height int, channels int, format string"


# ---------------------------------------------------------------------------
# real uncompressed codecs (pure numpy — BMP 24-bit and PPM P6)
# ---------------------------------------------------------------------------


def encode_bmp(img: np.ndarray) -> bytes:
    """Windows BMP, 24 bpp, BI_RGB (uncompressed): 14-byte file header +
    40-byte BITMAPINFOHEADER, rows bottom-up, BGR, padded to 4 bytes."""
    h, w = img.shape[:2]
    rgb = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    body = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    # bottom-up rows, BGR channel order
    body[:, :row_bytes] = rgb[::-1, :, ::-1].reshape(h, row_bytes)
    off = 14 + 40
    size = off + body.size
    head = (
        b"BM"
        + size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + body.size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2
    )
    return head + body.tobytes()


def encode_ppm(img: np.ndarray) -> bytes:
    """Binary PPM (P6): ASCII header, then raw RGB rows top-down."""
    h, w = img.shape[:2]
    rgb = img if img.ndim == 3 else np.repeat(img[:, :, None], 3, axis=2)
    return f"P6\n{w} {h}\n255\n".encode() + rgb.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """REAL image decode for uncompressed formats, pure numpy:
    24-bit BI_RGB BMP (header parse, bottom-up padded BGR rows) and
    binary PPM/P6 (ASCII header, top-down RGB). Returns (h, w, 3) uint8.
    Unknown magic (JPEG/PNG/...) raises NotImplementedError — the
    documented codec seam; swap PIL/cv2 imdecode in there on a cluster
    with codecs installed."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    buf = bytes(payload)
    if buf[:2] == b"BM":
        off = int.from_bytes(buf[10:14], "little")
        hdr_sz = int.from_bytes(buf[14:18], "little")
        w = int.from_bytes(buf[18:22], "little", signed=True)
        h = int.from_bytes(buf[22:26], "little", signed=True)
        bpp = int.from_bytes(buf[28:30], "little")
        comp = int.from_bytes(buf[30:34], "little")
        if hdr_sz < 40 or bpp != 24 or comp != 0:
            raise NotImplementedError(f"BMP variant unsupported (bpp={bpp}, comp={comp})")
        flip = h > 0
        h = abs(h)
        row_bytes = w * 3
        stride = row_bytes + ((-row_bytes) % 4)
        rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=off)
        rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR -> RGB
        return (rgb[::-1] if flip else rgb).copy()
    if buf[:2] == b"P6":
        # header: magic, width, height, maxval — whitespace/comment tolerant
        pos, vals = 2, []
        while len(vals) < 3:
            while pos < len(buf) and buf[pos : pos + 1].isspace():
                pos += 1
            if buf[pos : pos + 1] == b"#":  # comment to EOL
                while pos < len(buf) and buf[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(buf) and not buf[pos : pos + 1].isspace():
                pos += 1
            vals.append(int(buf[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = vals
        if maxval != 255:
            raise NotImplementedError("16-bit PPM unsupported")
        return (
            np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos)
            .reshape(h, w, 3)
            .copy()
        )
    raise NotImplementedError(
        "compressed image formats need a codec library (PIL/cv2) — "
        "only uncompressed BMP/PPM decode in-sandbox"
    )


def _gradient_image(width: int, height: int, seed: int) -> np.ndarray:
    """Deterministic test pattern with closed-form stats: every channel
    g(x, y) = x + 2*y + seed. Dims/seed are chosen by the attachers so
    max < 256 (no modulo) => mean = (w-1)/2 + (h-1) + seed and
    var = (w^2-1)/12 + (h^2-1)/3 exactly."""
    y = np.arange(height, dtype=np.int64)[:, None]
    x = np.arange(width, dtype=np.int64)[None, :]
    base = (x + 2 * y + seed).astype(np.uint8)
    return np.repeat(base[:, :, None], 3, axis=2)


def attach_image_payloads(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """REAL encoded image payloads (no stub): even ids carry 24-bit BMP,
    odd ids binary PPM — both written by the numpy encoders above, both
    readable by any standard image tool. Deterministic per id:
    w = 16 + (id%8)*8, h = 16 + (id%5)*8, seed = id%64 (so pixel values
    never wrap and the feature oracle is closed-form)."""

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("payload", T.BinaryType()),
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("channels", T.IntegerType()),
                T.StructField("format", T.StringType()),
            ]
        )
    )
    def synth(ids: pd.Series) -> pd.DataFrame:
        rows = []
        for i in ids:
            i = int(i)
            w, h, seed = 16 + (i % 8) * 8, 16 + (i % 5) * 8, i % 64
            img = _gradient_image(w, h, seed)
            if i % 2 == 0:
                rows.append((encode_bmp(img), w, h, 3, "image/bmp"))
            else:
                rows.append((encode_ppm(img), w, h, 3, "image/x-portable-pixmap"))
        return pd.DataFrame(
            rows, columns=["payload", "width", "height", "channels", "format"]
        )

    return df.withColumn("media", synth(F.col(id_col)))


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
    """Deterministic synthetic decoder for payloads that are NOT real
    images (fake video containers below): a seeded gradient so
    downstream feature math is testable. Real image payloads go through
    `decode_image` instead."""
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
                payload = bytes(m["payload"])
                if payload[:2] in (b"BM", b"P6"):
                    img = decode_image(payload)  # REAL decode, pure numpy
                else:  # synthetic non-image payloads (plumbing tests)
                    img = _decode_image_stub(
                        payload, int(m["width"]), int(m["height"]), int(m["channels"])
                    )
                h, w = img.shape[:2]  # from the DECODED pixels, not metadata
                rows.append(
                    {
                        "doc_id": r[id_col],
                        "width": int(w),
                        "height": int(h),
                        "mean_intensity": float(img.mean()),
                        "std_intensity": float(img.std()),
                        "aspect": float(w) / float(h),
                    }
                )
            yield pd.DataFrame(rows, columns=[
                "doc_id", "width", "height", "mean_intensity", "std_intensity", "aspect"
            ])

    return df.select(id_col, "media").mapInPandas(op, FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, target: int = 64, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas resize: decode -> nearest-neighbor downsample ->
    re-encode (raw bytes). Real BMP/PPM payloads decode for real; the
    payload-in/payload-out batch shape is what production pipelines use."""
    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                m = r["media"]
                payload = bytes(m["payload"])
                if payload[:2] in (b"BM", b"P6"):
                    img = decode_image(payload)
                else:
                    img = _decode_image_stub(
                        payload, int(m["width"]), int(m["height"]), int(m["channels"])
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
