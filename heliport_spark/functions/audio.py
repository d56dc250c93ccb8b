"""Audio/multimodal column handling: PCM decode, SNR, typed-metadata stubs.

The engine's input rows carry audio as an opaque ``bytes: binary`` column
with typed metadata (``sr_hz``, ``dur_ms``, ``codec``) — BASELINE.json
input_hint. The quality-filter pipeline must pass PCM through *untouched*
(allclose / SNR ≥ 30 dB after a decode→re-encode round trip), which these
helpers implement and the tests assert.

Real codec decode (opus/mp3), image decode, and frame sampling need native
libs absent from this container — those entry points are STUBBED with
``NotImplementedError`` but keep real Spark plumbing (schemas, Arrow batch
shapes) so swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StructField,
    StructType,
)


def decode_pcm_s16le(raw: bytes) -> np.ndarray:
    """PCM s16le bytes → float32 waveform in [-1, 1)."""
    return np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0


def encode_pcm_s16le(wave: np.ndarray) -> bytes:
    """float32 waveform → PCM s16le bytes (clip + round-to-even like most
    encoders; exact inverse of decode for in-range values)."""
    q = np.clip(np.rint(wave * 32768.0), -32768, 32767).astype("<i2")
    return q.tobytes()


def snr_db(reference: np.ndarray, test: np.ndarray) -> float:
    """Signal-to-noise ratio of ``test`` against ``reference`` in dB."""
    if len(reference) != len(test):
        return float("-inf")
    noise = reference - test
    ps = float(np.sum(reference.astype(np.float64) ** 2))
    pn = float(np.sum(noise.astype(np.float64) ** 2))
    if pn == 0.0:
        return float("inf")
    if ps == 0.0:
        return float("-inf")
    return 10.0 * np.log10(ps / pn)


def audio_features_df(df: DataFrame, bytes_col: str = "bytes",
                      sr_col: str = "sr_hz") -> DataFrame:
    """Append cheap waveform statistics (rms, peak, n_samples, clip_ratio)
    computed from the PCM column via Arrow batches. The bytes column passes
    through untouched."""
    out_schema = StructType(
        list(df.schema.fields)
        + [
            StructField("n_samples", IntegerType()),
            StructField("rms", FloatType()),
            StructField("peak", FloatType()),
            StructField("clip_ratio", FloatType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ns = np.zeros(n, dtype=np.int32)
            rms = np.zeros(n, dtype=np.float32)
            peak = np.zeros(n, dtype=np.float32)
            clip = np.zeros(n, dtype=np.float32)
            for i, raw in enumerate(pdf[bytes_col]):
                if raw is None or len(raw) == 0:
                    continue
                w = decode_pcm_s16le(raw)
                ns[i] = len(w)
                if len(w):
                    rms[i] = float(np.sqrt(np.mean(w.astype(np.float64) ** 2)))
                    peak[i] = float(np.max(np.abs(w)))
                    clip[i] = float(np.mean(np.abs(w) >= 32767.0 / 32768.0))
            pdf = pdf.copy(deep=False)
            pdf["n_samples"] = ns
            pdf["rms"] = rms
            pdf["peak"] = peak
            pdf["clip_ratio"] = clip
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


# ------------------------------------------------------------------ stubs

MEL_SCHEMA = StructType(
    [StructField("mel", ArrayType(FloatType())), StructField("n_frames", IntegerType())]
)


def decode_compressed_audio(raw: bytes, codec: str) -> np.ndarray:
    """Decode opus/mp3/flac → waveform. STUB: no codec libs in this container."""
    raise NotImplementedError(
        f"codec '{codec}' decode requires libsndfile/ffmpeg (not in container); "
        "pcm_s16le is handled by decode_pcm_s16le"
    )


def mel_features(wave: np.ndarray, sr_hz: int, n_mels: int = 80) -> np.ndarray:
    """Log-mel feature extraction. STUB (no DSP libs); deterministic fake
    with the real output shape for plumbing tests."""
    hop = 160
    n_frames = max(1, len(wave) // hop)
    rng = np.random.default_rng(len(wave) * 2654435761 % (2**32))
    return rng.standard_normal((n_frames, n_mels)).astype(np.float32)


def sample_video_frames(raw: bytes, every_ms: int = 1000) -> "list[bytes]":
    """Frame sampling from a video container. STUB: no ffmpeg in container."""
    raise NotImplementedError("video frame sampling requires ffmpeg (not in container)")
