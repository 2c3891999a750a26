"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is a ``binary``
column (or an object-store URI for >row-group-size blobs), the metadata is
a typed struct, and every decode / feature-extract / resize / frame-sample
step is an Arrow-batched ``mapInPandas`` so payloads stream through
executors batch-by-batch without ever materializing a partition in one
process.

Decode support is two-tier.  ``fake=True`` produces deterministic
features straight from the payload bytes (plumbing-only stand-in).
``fake=False`` runs REAL decoders implemented here in pure
numpy/struct for the two container formats that need no codec library:
PPM (P6) images and RIFF/WAV PCM audio — full header parsing, comment
and chunk handling, 8/16-bit PCM.  Compressed formats (png/jpeg/mp4)
would plug into the same seam via PIL/ffmpeg and raise
``NotImplementedError`` with a clear message until those libraries are
present.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# real pure-numpy codecs: PPM (P6) and RIFF/WAV PCM
# ---------------------------------------------------------------------------

def encode_ppm(pixels: "np.ndarray") -> bytes:
    """Binary PPM (P6) from an (h, w, 3) uint8 array."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected an (h, w, 3) RGB array")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm(data: bytes) -> "np.ndarray":
    """Parse a binary PPM (P6): header tokens (with ``#`` comments),
    then raw RGB — returns (h, w, 3) uint8."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raw = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raw.reshape(h, w, 3)


def encode_wav(samples: "np.ndarray", sample_rate: int,
               bits: int = 16) -> bytes:
    """RIFF/WAV PCM from float samples in [-1, 1] (mono)."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if bits == 16:
        raw = (x * 32767).astype("<i2").tobytes()
    elif bits == 8:
        raw = ((x * 127) + 128).astype("u1").tobytes()
    else:
        raise ValueError("bits must be 8 or 16")
    byte_rate = sample_rate * bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate,
                      bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> "tuple[int, np.ndarray]":
    """Parse RIFF/WAV PCM (walks chunks; 8- or 16-bit, mono or
    interleaved-averaged): returns (sample_rate, float64 samples in
    [-1, 1])."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, bits, channels, raw = 12, None, None, 1, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(f"non-PCM wav (format {audio_fmt})")
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or raw is None:
        raise ValueError("wav missing fmt/data chunk")
    if bits == 16:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 8:
        pcm = (np.frombuffer(raw, dtype="u1").astype(np.float64)
               - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM width {bits}")
    if channels > 1:
        pcm = pcm[:len(pcm) - len(pcm) % channels] \
            .reshape(-1, channels).mean(axis=1)
    return rate, pcm

#: metadata struct carried alongside every binary payload
MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),   # image/audio/video
    T.StructField("format", T.StringType()),       # png/jpeg/wav/mp4/...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
    T.StructField("sample_rate", T.IntegerType()),
])


def attach_fake_payload(df: DataFrame, text_col: str = "text",
                        payload_col: str = "payload",
                        meta_col: str = "media_meta") -> DataFrame:
    """Deterministic fake binary payload (utf-8 of the text) + metadata —
    the test stand-in for real image bytes."""
    return (df
            .withColumn(payload_col, F.encode(F.col(text_col), "utf-8"))
            .withColumn(meta_col, F.struct(
                F.lit("image").alias("media_type"),
                F.lit("fake").alias("format"),
                (F.length(text_col) % 640).cast("int").alias("width"),
                (F.length(text_col) % 480).cast("int").alias("height"),
                F.lit(1).alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"))))


IMAGE_FEATURES_SCHEMA = "id bigint, n_bytes int, first_byte int, " \
                        "checksum bigint, feat array<float>"


def extract_image_features(df: DataFrame, *, id_col: str,
                           payload_col: str = "payload",
                           fake: bool = True,
                           batch_size_hint: int = 1024) -> DataFrame:
    """Decode + featurize images via Arrow-batched ``mapInPandas``.

    Output: (id, n_bytes, first_byte, checksum, feat[8]).  With
    ``fake=True`` features are a deterministic function of the payload
    bytes; with ``fake=False`` payloads are decoded as binary PPM (P6)
    by :func:`decode_ppm` and feat[8] = [width, height, mean_r, mean_g,
    mean_b, std_all, min, max] over real pixels.  Compressed formats
    (png/jpeg) plug into the same seam via PIL when available.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
        import zlib

        def real_feat(b: bytes) -> list:
            px = decode_ppm(bytes(b)).astype(np.float64)
            return [float(px.shape[1]), float(px.shape[0]),
                    float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
                    float(px[:, :, 2].mean()), float(px.std()),
                    float(px.min()), float(px.max())]

        for pdf in batches:
            payloads = pdf[payload_col]
            if fake:
                feat = payloads.map(
                    lambda b: [float(len(b) % (i + 2)) for i in range(8)])
            else:
                feat = payloads.map(real_feat)
            out = pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int32"),
                "checksum": payloads.map(
                    lambda b: zlib.crc32(b)).astype("int64"),
                "feat": feat,
            })
            yield out

    src = df.select(F.col(id_col).alias(id_col), payload_col)
    return src.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = "id bigint, n_samples int, duration_s double, " \
                        "rms double, mfcc array<double>"


def extract_audio_features(df: DataFrame, *, id_col: str,
                           payload_col: str = "payload",
                           sample_rate: int = 16000,
                           fake: bool = True) -> DataFrame:
    """Audio decode + featurize (duration, RMS, MFCC-shaped vector) via
    Arrow-batched ``mapInPandas`` — the audio leg of the multimodal
    plumbing.

    Fake mode treats payload bytes as int8 PCM (deterministic,
    plumbing-only).  ``fake=False`` parses payloads as REAL RIFF/WAV
    PCM via :func:`decode_wav` — the sample rate and bit depth come
    from the file header (``sample_rate`` is only the fake-mode
    assumption).  Compressed codecs (mp3/flac) would plug into the
    same seam via torchaudio/librosa.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_samples, durations, rms_vals, mfccs = [], [], [], [], []
            for _, row in pdf.iterrows():
                if fake:
                    rate = sample_rate
                    pcm = np.frombuffer(row[payload_col], dtype=np.int8) \
                        .astype(np.float64) / 128.0
                else:
                    rate, pcm = decode_wav(bytes(row[payload_col]))
                n = len(pcm)
                ids.append(int(row[id_col]))
                n_samples.append(n)
                durations.append(n / float(rate))
                rms_vals.append(float(np.sqrt(np.mean(pcm ** 2)))
                                if n else 0.0)
                # 8 coarse spectral-band magnitudes as the MFCC stand-in
                spec = np.abs(np.fft.rfft(pcm, n=max(n, 16)))
                bands = np.array_split(spec, 8)
                mfccs.append([float(b.mean()) for b in bands])
            yield pd.DataFrame({"id": ids, "n_samples": n_samples,
                                "duration_s": durations, "rms": rms_vals,
                                "mfcc": mfccs})

    src = df.select(F.col(id_col).alias(id_col), payload_col)
    return src.mapInPandas(decode_batches, AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = "id bigint, frame_no int, frame_bytes binary"


def sample_frames(df: DataFrame, *, id_col: str,
                  payload_col: str = "payload", every_nth: int = 2,
                  fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads (one row per kept frame).

    Fake mode slices the payload bytes into pseudo-frames; real mode is
    the ffmpeg seam.
    """

    def split_batches(batches: Iterator[pd.DataFrame]
                      ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — not available; "
                    "use fake=True")
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col]
                n_frames = max(len(payload) // 16, 1)
                for frame_no in range(0, n_frames, every_nth):
                    rows.append((int(row[id_col]), frame_no,
                                 payload[frame_no * 16:(frame_no + 1) * 16]))
            yield pd.DataFrame(rows,
                               columns=["id", "frame_no", "frame_bytes"])

    src = df.select(F.col(id_col).alias(id_col), payload_col)
    return src.mapInPandas(split_batches, FRAME_SAMPLE_SCHEMA)
