"""Archive-segment export layout: WARC-style segment packing.

The step AFTER fetch that every production crawl runs and cola leaves
to the filesystem (public cola persists parsed results straight to
per-job files, cola/job/executor.py — no archival segmenting): fetched
records are grouped into fixed-target-size archive segments (Common
Crawl ships ~1 GB WARC segments; webdataset ships ~shard.tar files of
bounded byte size) so downstream consumers get uniformly-sized,
independently-readable units.

The layout decision is pure arithmetic over record sizes — the same
insight as packing.pack_offsets: compute the layout as a PLAN, not by
streaming bytes through a single writer. Policy (documented, exact):

  * records are deterministically hash-sharded over `n_writers`
    (md5/xxhash64 family — rerun- and engine-stable membership); each
    writer lays out its shard independently, so there is never a
    global running sum (the single-partition window scale bug);
  * within a writer, records are laid out in key order; a record's
    segment is `bytes_before DIV segment_bytes` — i.e. segment k holds
    the records whose START offset falls in [k*cap, (k+1)*cap). This
    is the rotate-after-exceed policy run by real segment writers: a
    segment's actual size is < cap + max_record_bytes (only its last
    record can overflow the target), and records are never split.
  * `seg_offset` is the record's byte offset within its segment's
    stream — the value a tar/WARC index stores next to the key.

One exchange keyed by writer (uniform by construction); each writer's
window is a linear scan of its own shard. n_writers scales with the
cluster: 10^10 records / 10^4 writers keeps every scan bounded.

The SAME operator serves both payload families here: WARC-ish document
segments (queries.py `warc_segment_plan`) and webdataset-style image
tar shards over the image+caption table (`image_shard_export`) — the
layout math does not care what the bytes are.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family


def segment_pack(
    records: DataFrame,
    segment_bytes: int,
    n_writers: int = 8,
    key_col: str = "key",
    bytes_col: str = "nbytes",
    hash_kind: str = "xxhash64",
) -> DataFrame:
    """(key, nbytes, writer, segment, seg_offset): the exact archive
    layout table. Deterministic: same records -> same layout, any
    engine. `segment` starts at 0 per writer; `seg_offset` is the
    record's start offset inside segment `segment`'s byte stream
    (global writer offset - segment * segment_bytes can exceed
    segment_bytes only for the one overflow record that closes a
    segment — consumers seek by (segment, seg_offset) where offsets
    are measured in the CONCATENATED writer stream modulo the segment
    grid, exactly how rotate-after-exceed writers index)."""
    writer = F.pmod(
        hash_family(hash_kind)(F.col(key_col).cast("string"), "seg"),
        F.lit(n_writers),
    ).cast("long")
    base = records.select(
        F.col(key_col).alias("key"),
        F.col(bytes_col).cast("long").alias("nbytes"),
        writer.alias("writer"),
    )
    w = Window.partitionBy("writer").orderBy("key")
    cum = F.sum("nbytes").over(w)
    return (
        base.withColumn("_before", (cum - F.col("nbytes")).cast("long"))
        .select(
            "key",
            "nbytes",
            "writer",
            F.expr(f"_before div {segment_bytes}").cast("long").alias(
                "segment"
            ),
            F.expr(f"_before % {segment_bytes}").cast("long").alias(
                "seg_offset"
            ),
        )
    )


def segment_manifest(layout: DataFrame) -> DataFrame:
    """Per-(writer, segment) manifest over a segment_pack layout:
    record count, payload bytes (can exceed the target only via the
    single closing overflow record), and the first/last record keys —
    the sidecar a consumer reads before opening a segment. Key-scale
    aggregate; no new exchange class (keyed by the layout's own
    partitioning prefix)."""
    return layout.groupBy("writer", "segment").agg(
        F.count("*").cast("long").alias("n_records"),
        F.sum("nbytes").cast("long").alias("seg_bytes"),
        F.min("key").alias("first_key"),
        F.max("key").alias("last_key"),
    )
