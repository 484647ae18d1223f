"""Deterministic pixel synthesis + quality metrics.

Pixels are a seeded-RNG gradient + noise, a pure function of image_id —
so any stage of the pipeline can regenerate the ground-truth pixels to
verify the decode invariant (PSNR ≥ 40 dB lossy / bit-exact lossless)
without shipping originals around.
"""

from __future__ import annotations

import hashlib

import numpy as np


def _seed_of(image_id: str) -> int:
    return int.from_bytes(hashlib.md5(image_id.encode()).digest()[:8], "big")


def gen_pixels(image_id: str, w: int, h: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 pixels for an image_id."""
    rng = np.random.default_rng(_seed_of(image_id))
    gx = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
    gy = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
    base = (gx * rng.uniform(0.2, 1.0, 3) + gy * rng.uniform(0.2, 1.0, 3)) / 2.0
    noise = rng.normal(0, 24, (h, w, 3))
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash: 8×8 mean-downsampled luma vs its median.

    Mirrors the classic average-hash construction; used for near-dup
    reporting on the images table (cola has no analogue — the reference
    dedups on URL identity only, cola/core/dedup.py).
    """
    luma = pixels.astype(np.float32) @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    h, w = luma.shape
    ys = (np.arange(9) * h // 8).astype(int)
    xs = (np.arange(9) * w // 8).astype(int)
    blocks = np.empty((8, 8), dtype=np.float64)
    for i in range(8):
        for j in range(8):
            blocks[i, j] = luma[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
    bits = (blocks > np.median(blocks)).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v  # signed int64 for Spark LongType


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(255.0**2 / mse))
