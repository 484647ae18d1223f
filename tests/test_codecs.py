"""Codec invariants: PNG bit-exact, JPGQ PSNR ≥ 40 dB (BASELINE.json:15)."""

import numpy as np
import pytest

from cola_spark.codecs import decode_image, encode_image, gen_pixels, psnr
from cola_spark.codecs.pixels import phash64


@pytest.mark.parametrize("w,h", [(16, 16), (24, 32), (32, 24)])
def test_png_roundtrip_bitexact(w, h):
    px = gen_pixels(f"img_{w}x{h}", w, h)
    assert np.array_equal(decode_image(encode_image(px, "png"), "png"), px)


def test_jpgq_psnr_above_40db():
    for i in range(20):
        px = gen_pixels(f"imgq{i}", 32, 32)
        rec = decode_image(encode_image(px, "jpgq"), "jpgq")
        p = psnr(px, rec)
        assert p >= 40.0, f"PSNR {p:.2f} < 40"
        assert p < 60.0  # lossy: really quantized, not accidentally exact


def test_pixels_deterministic():
    a, b = gen_pixels("imgX", 24, 24), gen_pixels("imgX", 24, 24)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, gen_pixels("imgY", 24, 24))


def test_phash_stable_and_near_dup_tolerant():
    px = gen_pixels("imgZ", 32, 32)
    h1 = phash64(px)
    assert h1 == phash64(px)
    # 6-bit quantization barely moves the perceptual hash
    from cola_spark.codecs import decode_jpgq, encode_jpgq

    h2 = phash64(decode_jpgq(encode_jpgq(px)))
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 6


def test_unknown_fmt_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")
