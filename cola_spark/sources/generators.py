"""Deterministic synthetic-table generators (seed=42 semantics, no wall
clock, no Python randomness outside seeded RNGs).

Replaces the reference's live inputs: seed lists fed to the MQ
(cola/job/__init__.py JobDescription.starts ~L60-90) and pages fetched
by openers (cola/core/opener.py). Everything here is generated
*distributed* — `spark.range(n)` + column expressions or mapInPandas —
so the same code synthesizes a 10^10-row frontier on a cluster; nothing
materializes on the driver.

Determinism across parallelism levels: every attribute is a pure
function of the row id (via Spark's fixed xxhash64 or a Python md5 of
the id), never of partition/iteration order.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BASE_EPOCH = 1700000000  # fixed 2023-11-14T22:13:20Z; never wall clock

_ADJ = ["quiet", "amber", "vivid", "rustic", "bright", "pale", "dusky", "crisp"]
_NOUN = ["harbor", "meadow", "skyline", "canyon", "orchard", "glacier", "lagoon", "mesa"]

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long"
)


def caption_of(image_id: str) -> str:
    import hashlib

    d = hashlib.md5(image_id.encode()).digest()
    return f"caption of {image_id}: {_ADJ[d[0] % 8]} {_NOUN[d[1] % 8]}"


def gen_images(
    spark: SparkSession, n_images: int, parts: int | None = None,
    dims: tuple = (16, 24, 32),
) -> DataFrame:
    """The payload table — exactly the input_hint schema (BASELINE.json:15).

    ``dims`` controls the size universe (benchmarks use larger images to
    weight the decode stage like production payloads)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from cola_spark.codecs import encode_image
        from cola_spark.codecs.pixels import gen_pixels, phash64

        dims_l = list(dims)
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                image_id = f"img{int(i):08d}"
                d = hashlib.md5(image_id.encode()).digest()
                w, h = dims_l[d[2] % len(dims_l)], dims_l[d[3] % len(dims_l)]
                fmt = "png" if d[4] % 2 == 0 else "jpgq"
                px = gen_pixels(image_id, w, h)
                rows.append(
                    (image_id, encode_image(px, fmt), w, h, fmt, caption_of(image_id), phash64(px))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    rng = spark.range(n_images, numPartitions=parts or spark.sparkContext.defaultParallelism)
    return rng.mapInPandas(batches, IMAGES_SCHEMA)


def gen_frontier_seeds(
    spark: SparkSession,
    n_urls: int,
    n_hosts: int = 200,
    pages_per_host: int = 50,
    parts: int | None = None,
) -> DataFrame:
    """Seed/discovered-URL list with Zipf(s≈1.1) host skew.

    Host ids follow a bounded-Pareto inverse CDF (continuous Zipf
    approximation) so one hot host floods its partition unless the
    scheduler salts — exactly the skew the north rule requires handling.
    Duplicate and near-duplicate URL variants (fragments, query-order
    permutations) exercise canonicalization + dedup.
    """
    s = 1.1
    hmax = float(n_hosts)
    df = spark.range(n_urls, numPartitions=parts or spark.sparkContext.defaultParallelism)
    u = (F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(1_000_000)) + 0.5) / 1_000_000.0
    # inverse CDF of bounded Pareto on [1, hmax]: x = (1 - u(1 - hmax^(1-s)))^(1/(1-s))
    host_id = F.least(
        F.lit(n_hosts - 1),
        F.floor(F.pow(1.0 - u * (1.0 - float(hmax ** (1.0 - s))), 1.0 / (1.0 - s))) - 1,
    ).cast("int")
    page = F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(pages_per_host))
    variant = F.pmod(F.xxhash64(F.col("id"), F.lit(11)), F.lit(10))
    base = F.format_string("http://h%06d.example/p/%d", host_id, page)
    url = (
        F.when(variant == 0, F.concat(base, F.lit("#frag")))
        .when(variant == 1, F.concat(base, F.lit("?b=2&a=1")))
        .when(variant == 2, F.concat(base, F.lit("?a=1&b=2")))
        .otherwise(base)
    )
    return df.select(
        url.alias("url"),
        F.format_string("h%06d.example", host_id).alias("host"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(13)), F.lit(3)).cast("int").alias("priority"),
        F.col("id").alias("seq"),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(17)), F.lit(20)) == 0).alias("force"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id")).alias("discovered_ts"),
    )


def gen_robots(spark: SparkSession, n_hosts: int = 200) -> DataFrame:
    """robots.txt table: ~every 10th host disallows /p/1* ; every 50th
    disallows everything. (North-rule addition — the reference has no
    robotparser; its openers fetch unconditionally.)"""
    df = spark.range(n_hosts)
    host = F.format_string("h%06d.example", F.col("id").cast("int"))
    return (
        df.filter((F.col("id") % 10 == 3) | (F.col("id") % 50 == 7))
        .select(
            host.alias("host"),
            F.when(F.col("id") % 50 == 7, F.lit("/")).otherwise(F.lit("/p/1")).alias("disallow_prefix"),
        )
    )


def gen_budgets(spark: SparkSession, n_hosts: int = 200) -> DataFrame:
    """Per-host politeness config: total budget + per-round token refill.

    Mirrors cola's BudgetApplyServer budgets dict (cola/functions/budget.py
    ~L20-110) and SpeedControlServer pages/minute rates
    (cola/functions/speed.py ~L20-220), re-expressed as a table.
    """
    df = spark.range(n_hosts)
    return df.select(
        F.format_string("h%06d.example", F.col("id").cast("int")).alias("host"),
        (5 + F.pmod(F.xxhash64(F.col("id"), F.lit(23)), F.lit(46))).alias("budget"),
        (2 + F.pmod(F.xxhash64(F.col("id"), F.lit(29)), F.lit(8))).alias("rate_per_round"),
    )


def gen_audio(
    spark: SparkSession, n_audios: int, parts: int | None = None,
    sample_rates: tuple = (8000, 16000),
) -> DataFrame:
    """The audio payload table (the gen_images twin): audio_id, bytes
    (WAVF container), sample_rate, n_samples, fmt. Everything is an
    md5-pure function of the row id — deterministic at any parallelism.
    Durations span ~0.1-0.5 s so feature/resample stages do real work
    without dominating test time."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from cola_spark.codecs import encode_audio, gen_samples

        srs = list(sample_rates)
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                audio_id = f"aud{int(i):08d}"
                d = hashlib.md5(audio_id.encode()).digest()
                sr = srs[d[10] % len(srs)]
                n = 800 + (int.from_bytes(d[11:13], "little") % 3200)
                s = gen_samples(audio_id, n, sr)
                rows.append((audio_id, encode_audio(s, sr, "wavf"), sr, n, "wavf"))
            yield pd.DataFrame(
                rows, columns=["audio_id", "bytes", "sample_rate", "n_samples", "fmt"]
            )

    rng = spark.range(n_audios, numPartitions=parts) if parts else spark.range(n_audios)
    return rng.mapInPandas(
        batches,
        "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string",
    )
