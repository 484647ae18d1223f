"""Pure-stdlib/numpy image codecs (no PIL/cv2 in the sandbox).

``png``  — a real, spec-conformant RGB8 PNG (zlib + struct, filter 0):
           decode must be bit-exact (lossless invariant).
``jpgq`` — simulated lossy codec: 6-bit uniform quantization of RGB.
           Max abs error 2 → PSNR ≈ 46.4 dB, satisfying (and tightly
           exercising) the per-row PSNR ≥ 40 dB invariant from
           BASELINE.json input_hint.

Real JPEG/WebP decoding is environment-gated: see ``decode_image`` which
dispatches on ``fmt`` and raises NotImplementedError for formats whose
decoders aren't available offline (the Spark-side plumbing — schema,
batching, UDF signature — is identical either way).
"""

from cola_spark.codecs.png_codec import decode_png, encode_png
from cola_spark.codecs.jpgq_codec import decode_jpgq, encode_jpgq
from cola_spark.codecs.pixels import gen_pixels, psnr
from cola_spark.codecs.wavf_codec import (
    decode_wavf, encode_wavf, gen_samples, resample_nn,
)


def encode_image(pixels, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(pixels)
    if fmt == "jpgq":
        return encode_jpgq(pixels)
    raise NotImplementedError(f"no encoder for fmt={fmt!r} in this environment")


def decode_image(data: bytes, fmt: str):
    """Decode one image payload to an (h, w, 3) uint8 array.

    Formats beyond png/jpgq (real jpeg, webp, ...) would dispatch to
    PIL/libjpeg here; those libs are absent offline, so they raise — the
    vectorized UDF plumbing around this call is format-agnostic.
    """
    if fmt == "png":
        return decode_png(data)
    if fmt == "jpgq":
        return decode_jpgq(data)
    raise NotImplementedError(f"no decoder for fmt={fmt!r} in this environment")


def encode_audio(samples, sample_rate: int, fmt: str) -> bytes:
    if fmt == "wavf":
        return encode_wavf(samples, sample_rate)
    raise NotImplementedError(f"no audio encoder for fmt={fmt!r} in this environment")


def decode_audio(data: bytes, fmt: str):
    """Decode one audio payload to (int16 samples, sample_rate).

    Formats beyond wavf (mp3, opus, flac, ...) would dispatch to
    libsndfile/ffmpeg here; those libs are absent offline, so they
    raise — the vectorized UDF plumbing around this call is
    format-agnostic (same contract as decode_image)."""
    if fmt == "wavf":
        return decode_wavf(data)
    raise NotImplementedError(f"no audio decoder for fmt={fmt!r} in this environment")


__all__ = [
    "encode_png", "decode_png", "encode_jpgq", "decode_jpgq",
    "encode_image", "decode_image", "gen_pixels", "psnr",
    "encode_wavf", "decode_wavf", "encode_audio", "decode_audio",
    "gen_samples", "resample_nn",
]
