"""WAVF — the audio stand-in container (the image path's PNG/JPGQ
analogue): magic + sample rate + length-prefixed int16 mono PCM.
Pure stdlib/numpy, bit-exact roundtrip, so audio-pipeline plumbing
(schema, batching, feature extraction, resample) is REAL while
lossy-codec decode (mp3/opus/flac — no libs offline) stays env-gated
at the dispatch in cola_spark.codecs.

Synthesis is deterministic per audio_id: two md5-derived sine partials
plus seeded noise, scaled to int16 — the audio twin of
pixels.gen_pixels.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_MAGIC = b"WAVF"


def encode_wavf(samples: np.ndarray, sample_rate: int) -> bytes:
    s = np.asarray(samples, dtype=np.int16)
    return _MAGIC + struct.pack("<iI", int(sample_rate), len(s)) + s.tobytes()


def decode_wavf(data: bytes) -> tuple[np.ndarray, int]:
    if data[:4] != _MAGIC:
        raise ValueError("not a WAVF container")
    sr, n = struct.unpack_from("<iI", data, 4)
    samples = np.frombuffer(data, dtype=np.int16, count=n, offset=12)
    return samples, sr


def gen_samples(audio_id: str, n: int, sample_rate: int) -> np.ndarray:
    """Deterministic int16 mono signal for ``audio_id``: two sine
    partials (md5-derived frequency/phase/amplitude) + seeded noise."""
    d = hashlib.md5(audio_id.encode()).digest()
    t = np.arange(n, dtype=np.float64) / sample_rate
    f1 = 80.0 + d[0] * 8.0  # 80..2120 Hz
    f2 = 40.0 + d[1] * 16.0
    a1 = 0.35 + (d[2] % 64) / 256.0
    a2 = 0.10 + (d[3] % 64) / 512.0
    ph1 = d[4] / 255.0 * 2 * np.pi
    ph2 = d[5] / 255.0 * 2 * np.pi
    sig = a1 * np.sin(2 * np.pi * f1 * t + ph1) + a2 * np.sin(
        2 * np.pi * f2 * t + ph2
    )
    rng = np.random.default_rng(int.from_bytes(d[6:10], "little"))
    sig += 0.02 * rng.standard_normal(n)
    return np.clip(sig * 20000.0, -32768, 32767).astype(np.int16)


def resample_nn(samples: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    """Nearest-neighbour sample-index resample (the resize_nn twin):
    output length = floor(n * sr_to / sr_from)."""
    s = np.asarray(samples, dtype=np.int16)
    n2 = len(s) * sr_to // sr_from
    idx = (np.arange(n2, dtype=np.int64) * sr_from // sr_to).clip(0, len(s) - 1)
    return s[idx]
