"""Simulated lossy codec: 6-bit uniform quantization of RGB8 + zlib.

Stands in for JPEG offline. Reconstruction error per sample is uniform
in {-2, -1, 0, +1} (step 4, midpoint +2), so MSE = 1.5 and
PSNR = 10·log10(255² / 1.5) ≈ 46.4 dB — above the 40 dB per-row
invariant, but close enough that any decode bug fails it.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"JPGQ"


def encode_jpgq(pixels: np.ndarray) -> bytes:
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8")
    h, w = pixels.shape[:2]
    q = (pixels >> 2).astype(np.uint8)  # 6-bit codes
    return _MAGIC + struct.pack(">II", w, h) + zlib.compress(q.tobytes(), 6)


def decode_jpgq(data: bytes) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not a JPGQ payload")
    w, h = struct.unpack_from(">II", data, 4)
    q = np.frombuffer(zlib.decompress(data[12:]), dtype=np.uint8).reshape(h, w, 3)
    return ((q.astype(np.uint16) << 2) + 2).clip(0, 255).astype(np.uint8)
