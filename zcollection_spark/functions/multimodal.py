"""Multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is a ``binary``
column (or an object-store URI for >row-group-size blobs), the metadata is
a typed struct, and every decode / feature-extract / resize / frame-sample
step is an Arrow-batched ``mapInPandas`` so payloads stream through
executors batch-by-batch without ever materializing a partition in one
process.

The image/audio codec libraries are NOT in this container, so the decode
kernels are stubbed: ``fake=True`` produces deterministic features derived
from the bytes (plumbing fully real and testable — schema, batching,
partitioning); ``fake=False`` raises ``NotImplementedError`` at the exact
point a real decoder (PIL / ffmpeg / torchaudio) would plug in.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    bytes; with ``fake=False`` this is where a real vision decode
    (PIL/torchvision) runs per Arrow batch.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
        import zlib
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decode requires PIL/torchvision — not "
                    "available in this environment; use fake=True")
            payloads = pdf[payload_col]
            out = pd.DataFrame({
                "id": pdf[id_col].astype("int64"),
                "n_bytes": payloads.map(len).astype("int32"),
                "first_byte": payloads.map(
                    lambda b: b[0] if len(b) else -1).astype("int32"),
                "checksum": payloads.map(
                    lambda b: zlib.crc32(b)).astype("int64"),
                "feat": payloads.map(
                    lambda b: [float(len(b) % (i + 2)) for i in range(8)]),
            })
            yield out

    src = df.select(F.col(id_col).alias(id_col), payload_col)
    return src.mapInPandas(decode_batches, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = "id bigint, n_samples int, duration_s float, " \
                        "rms float, mfcc array<float>"


def extract_audio_features(df: DataFrame, *, id_col: str,
                           payload_col: str = "payload",
                           sample_rate: int = 16000,
                           fake: bool = True) -> DataFrame:
    """Audio decode + featurize (duration, RMS, MFCC-shaped vector) via
    Arrow-batched ``mapInPandas`` — the audio leg of the multimodal
    plumbing.  Fake mode treats payload bytes as int8 PCM and computes
    real math over them (deterministic, testable); ``fake=False`` is the
    torchaudio/librosa seam.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]
                       ) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real audio decode requires torchaudio/librosa — not "
                    "available in this environment; use fake=True")
            ids, n_samples, durations, rms_vals, mfccs = [], [], [], [], []
            for _, row in pdf.iterrows():
                pcm = np.frombuffer(row[payload_col], dtype=np.int8) \
                    .astype(np.float32) / 128.0
                n = len(pcm)
                ids.append(int(row[id_col]))
                n_samples.append(n)
                durations.append(n / float(sample_rate))
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
