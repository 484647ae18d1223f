"""Multimodal column operators: images/audio/video as opaque binary +
typed metadata, processed by Arrow-vectorized stages.

The reference stores raw page bytes and hands them to user parsers
(cola/core/opener.py → Parser.parse); the 100 TB-pipeline analogues
are decode / resize / feature-extract / frame-sample. Pure-numpy
pieces (resize, features, the PNG/JPGQ codecs) are REAL; stages that
need libjpeg/ffmpeg-class decoders are environment-gated — they raise
NotImplementedError with the format name (cola_spark.codecs
.decode_image), while the Spark-side plumbing (schema, batching,
mapInPandas signatures) is identical to the production path and fully
tested.

Video stand-in: the `VIDF` container — a length-prefixed sequence of
encoded frames. Container parsing and frame sampling are real;
per-frame decoding routes through the same gated codec dispatch.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resize_nn(pixels: np.ndarray, w2: int, h2: int) -> np.ndarray:
    """Nearest-neighbour resize (pure numpy, deterministic)."""
    h, w = pixels.shape[:2]
    ys = (np.arange(h2) * h // h2).clip(0, h - 1)
    xs = (np.arange(w2) * w // w2).clip(0, w - 1)
    return pixels[ys][:, xs]


def resize_images(images: DataFrame, w2: int, h2: int) -> DataFrame:
    """Decode → resize → re-encode (PNG) as one vectorized stage.

    Output schema: image_id, bytes (png of w2×h2), w, h, fmt='png'.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cola_spark.codecs import decode_image, encode_png

        for pdf in it:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                rows.append((image_id, encode_png(resize_nn(px, w2, h2)), w2, h2, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        batches, "image_id string, bytes binary, w int, h int, fmt string"
    )


def image_features(images: DataFrame) -> DataFrame:
    """Decode → per-image features: mean/std luma (scaled ints), phash.

    The embedding-extraction stand-in: same shape as a real
    CLIP-style feature stage (binary in → fixed-width features out).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cola_spark.codecs import decode_image
        from cola_spark.codecs.pixels import phash64

        for pdf in it:
            rows = []
            for image_id, data, fmt in zip(pdf["image_id"], pdf["bytes"], pdf["fmt"]):
                px = decode_image(bytes(data), fmt)
                luma = px.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
                rows.append((
                    image_id, px.shape[1], px.shape[0],
                    int(luma.mean() * 1000), int(luma.std() * 1000), phash64(px),
                ))
            yield pd.DataFrame(
                rows,
                columns=["image_id", "w", "h", "mean_luma_x1000", "std_luma_x1000", "phash"],
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        batches,
        "image_id string, w int, h int, mean_luma_x1000 long, std_luma_x1000 long, phash long",
    )


def phash_near_dup_pairs(images: DataFrame, max_hamming: int = 6, bands: int = 4) -> DataFrame:
    """Near-duplicate images by perceptual hash: multi-band bucketing
    (4 bands × 16 bits — guaranteed detection for Hamming ≤ bands-1,
    unlike a single top-16-bit bucket which misses any pair whose
    differing bits fall in the bucket) + bit_count(xor) verify — the
    same blocked-join core as the SimHash text path."""
    from cola_spark.operators.textdedup import banded_hamming_pairs

    feats = images.select("image_id", "phash")
    return banded_hamming_pairs(
        feats, "image_id", "phash", bands, max_hamming, out_a="img_a", out_b="img_b"
    )


# ------------------------------------------------------------------ video


_VID_MAGIC = b"VIDF"


def encode_vidf(frames: list[bytes]) -> bytes:
    """The VIDF stand-in container: magic + frame count + length-
    prefixed encoded frames."""
    out = [_VID_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def iter_vidf_frames(data: bytes):
    if data[:4] != _VID_MAGIC:
        raise ValueError("not a VIDF container")
    (n,) = struct.unpack_from("<I", data, 4)
    off = 8
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", data, off)
        off += 4
        yield data[off : off + ln]
        off += ln


def frame_sample(videos: DataFrame, every_n: int = 2, frame_fmt: str = "jpgq") -> DataFrame:
    """Sample every Nth frame from VIDF containers — a UDTF-shaped
    mapInPandas (1 video row in, N frame rows out). Real-codec video
    (h264 etc.) would plug in at the container-parsing seam and raises
    NotImplementedError today (no ffmpeg offline)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for vid, data in zip(pdf["video_id"], pdf["bytes"]):
                for i, frame in enumerate(iter_vidf_frames(bytes(data))):
                    if i % every_n == 0:
                        rows.append((vid, i, frame, frame_fmt))
            yield pd.DataFrame(rows, columns=["video_id", "frame_no", "bytes", "fmt"])

    return videos.select("video_id", "bytes").mapInPandas(
        batches, "video_id string, frame_no int, bytes binary, fmt string"
    )
