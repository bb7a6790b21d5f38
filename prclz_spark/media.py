"""Multimodal column plumbing beyond images: resize, frame-sample, audio
features.

Per the build spec, the image/audio/video DECODE steps that need codecs not
present in this container are stubbed behind deterministic fakes that are
CLEARLY MARKED, while the Spark-side plumbing — schemas, partitioning, UDF
signatures, Arrow batch shapes — is real and tested:

* `img_resize` — REAL (area-mean downsample + nearest upsample on the
  from-scratch PNG codec in images.py).
* `sample_video_frames` — the H.264/VP9 decode is STUBBED (
  `_fake_video_decode`): frames are deterministic functions of
  (video_id, frame_index) via images.make_pixels. Swap `_fake_video_decode`
  for PyAV/ffmpeg bindings in a full deployment; everything downstream
  (schema `ARRAY<STRUCT<idx INT, png BINARY>>`, batching, phash per frame)
  is production-shaped.
* `audio_features` — the MP3/FLAC decode is STUBBED
  (`_fake_audio_decode`: seeded waveform); the feature math (RMS frames,
  zero-crossing rate, spectral centroid via numpy FFT) is real DSP.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

from . import images as IM


def _stable_seed(s: str) -> int:
    """Deterministic string seed (Python's hash() varies per process)."""
    h = 0
    for ch in s.encode("utf-8"):
        h = (h * 1099511628211 + ch) & 0x7FFFFFFF
    return h


# --- real resize -------------------------------------------------------------

def resize_pixels(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-mean for integer downsampling, nearest otherwise (pure numpy)."""
    h, w, _ = px.shape
    if h % out_h == 0 and w % out_w == 0:
        fh, fw = h // out_h, w // out_w
        return (
            px.reshape(out_h, fh, out_w, fw, 3).mean(axis=(1, 3)).round().astype(np.uint8)
        )
    yi = np.clip((np.arange(out_h) + 0.5) * h / out_h, 0, h - 1).astype(int)
    xi = np.clip((np.arange(out_w) + 0.5) * w / out_w, 0, w - 1).astype(int)
    return px[yi][:, xi]


def make_resize_udf(out_w: int, out_h: int):
    @pandas_udf(BinaryType())
    def img_resize(data: pd.Series, fmt: pd.Series) -> pd.Series:
        out = []
        for b, f in zip(data, fmt):
            px = IM.decode(bytes(b), f)
            out.append(IM.png_encode(resize_pixels(px, out_w, out_h)))
        return pd.Series(out)

    return img_resize


# --- video: STUBBED decode, real plumbing ------------------------------------

def _fake_video_decode(video_seed: int, frame_idx: int, w: int = 64, h: int = 64) -> np.ndarray:
    """DETERMINISTIC STAND-IN for a video decoder (no ffmpeg in this
    container): frame = seeded synthetic image per (video, frame)."""
    return IM.make_pixels(video_seed * 1_000 + frame_idx, w, h)


FRAME_SCHEMA = ArrayType(
    StructType([StructField("idx", IntegerType()), StructField("png", BinaryType())])
)


def make_frame_sampler_udf(every_n: int = 10, max_frames: int = 5):
    @pandas_udf(FRAME_SCHEMA)
    def sample_video_frames(video_id: pd.Series, n_frames: pd.Series) -> pd.Series:
        out = []
        for vid, n in zip(video_id, n_frames):
            seed = _stable_seed(str(vid))
            idxs = list(range(0, int(n), every_n))[:max_frames]
            out.append(
                [
                    {"idx": i, "png": IM.png_encode(_fake_video_decode(seed, i))}
                    for i in idxs
                ]
            )
        return pd.Series(out)

    return sample_video_frames


# --- audio: STUBBED decode, real DSP ------------------------------------------

def _fake_audio_decode(audio_seed: int, n_samples: int = 8000, sr: int = 8000) -> np.ndarray:
    """DETERMINISTIC STAND-IN for an audio decoder: seeded mix of tones +
    noise (float32 waveform in [-1, 1])."""
    rng = np.random.default_rng(audio_seed)
    t = np.arange(n_samples) / sr
    f0 = 110.0 * (1 + (audio_seed % 8))
    wave = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(2 * np.pi * 2.5 * f0 * t)
    wave += 0.1 * rng.standard_normal(n_samples)
    return np.clip(wave, -1, 1).astype(np.float32)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("spectral_centroid_hz", DoubleType()),
    ]
)


@pandas_udf(AUDIO_FEATURES_SCHEMA)
def audio_features(audio_id: pd.Series) -> pd.DataFrame:
    rows = []
    sr = 8000
    for aid in audio_id:
        seed = _stable_seed(str(aid))
        w = _fake_audio_decode(seed).astype(np.float64)
        rms = float(np.sqrt(np.mean(w**2)))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(w))).astype(float)))
        spec = np.abs(np.fft.rfft(w))
        freqs = np.fft.rfftfreq(len(w), 1 / sr)
        centroid = float((spec * freqs).sum() / max(spec.sum(), 1e-12))
        rows.append((rms, zcr, centroid))
    return pd.DataFrame(rows, columns=["rms", "zcr", "spectral_centroid_hz"])
