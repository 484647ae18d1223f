"""Training-sequence packing: concat-and-chunk token layout per shard.

The last step before a crawled corpus feeds a trainer: documents are
concatenated in a deterministic order and sliced into fixed-length
context windows (GPT-style packing — documents may straddle window
boundaries; the attention mask handles the seam). The layout decision
is pure arithmetic over token counts, so it is computed as a plan, not
by streaming bytes: each document's global token offset is a running
sum, and the windows it lands in follow by integer division.

No reference analogue — cola (SURVEY.md §2) stops at fetch/parse;
packing is the trainer-facing step layered on the cleaned corpus.

Scale design: a single global running sum would be one partition — the
classic window-function scale bug. Real pipelines pack PER OUTPUT
SHARD (each writer owns a shard and packs it independently), so the
layout here is: deterministic hash-shard the documents (same md5/xxhash
family as every other keyed decision in this repo, so membership is
rerun- and engine-stable), then one window per shard. One exchange
keyed by shard — writer-shaped, uniform by construction (hash of the
doc key), each shard's window is a linear scan. n_shards scales with
the cluster; 10^10 docs / 10^4 shards keeps every scan bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family, spread_small_scan


def pack_offsets(
    docs: DataFrame,
    ctx_len: int = 2048,
    n_shards: int = 8,
    hash_kind: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, shard, n_tok, start_off, first_bin, last_bin) — the
    exact token-layout table for concat-and-chunk packing.

    Within a shard, docs are laid out in doc-id order; `start_off` is
    the document's first token's offset in the shard's token stream,
    `first_bin`/`last_bin` the ctx_len-sized windows it touches
    (inclusive). Deterministic: same corpus → same layout, any engine.
    """
    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    shard = F.pmod(
        hash_family(hash_kind)(F.col(id_col).cast("string"), "pack"),
        F.lit(n_shards),
    ).cast("long")
    base = spread_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"), ntok.alias("n_tok"), shard.alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    cum = F.sum("n_tok").over(w)
    laid = base.select(
        "doc_id",
        "shard",
        "n_tok",
        (cum - F.col("n_tok")).cast("long").alias("start_off"),
    )
    # integer `div` (not floor of a float division) keeps the bin ids
    # engine-exact; n_tok >= 1 always (whitespace-split of a trimmed
    # string yields at least one element), so last_bin >= first_bin.
    return laid.select(
        "doc_id",
        "shard",
        "n_tok",
        "start_off",
        F.expr(f"start_off div {ctx_len}").cast("long").alias("first_bin"),
        F.expr(f"(start_off + n_tok - 1) div {ctx_len}").cast("long").alias(
            "last_bin"
        ),
    )


# SDXL-style aspect ladder: (bw, bh) ratio buckets. bh values divide
# _AB_LCM, so cross-bucket fraction comparison is exact integer math.
ASPECT_BUCKETS = [(1, 1), (4, 3), (3, 4), (16, 9), (9, 16), (2, 1), (1, 2)]
_AB_LCM = 144  # lcm of the bh values {1, 3, 4, 9, 16, 2}


def aspect_bucket_pack(
    imgs: DataFrame,
    buckets: list[tuple[int, int]] | None = None,
    batch_size: int = 8,
    n_shards: int = 8,
    hash_kind: str = "xxhash64",
    id_col: str = "doc_id",
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """(doc_id, w, h, bucket, bw, bh, shard, batch_idx, slot):
    aspect-ratio bucket batching — the image-trainer layout step
    (SDXL-style): each image joins the ratio bucket nearest its own
    aspect, then bucket members are packed into fixed-size batches so
    a training step never mixes aspect ratios.

    Nearest bucket is exact integer arithmetic: |w/h - bw/bh| compared
    across buckets as |w*bh - bw*h| * (LCM/bh) — a common-denominator
    fraction comparison with zero floats; ties break to the earlier
    bucket in the ladder. The argmin is an expanded LEAST + CASE chain
    (scalar codegen, the lang-id pattern), never a per-row array sort.

    Scale design: same as pack_offsets — one global row_number per
    bucket would put 10^10/|buckets| rows through single partitions
    (the global-window scale bug), so images are deterministically
    hash-sharded FIRST and each (bucket, shard) packs independently:
    one exchange keyed by (bucket, shard), uniform by construction,
    n_shards scales with the writer count."""
    buckets = ASPECT_BUCKETS if buckets is None else buckets
    metrics = [
        (
            F.abs(F.col(w_col) * F.lit(bh) - F.lit(bw) * F.col(h_col))
            * F.lit(_AB_LCM // bh)
        ).cast("long")
        for bw, bh in buckets
    ]
    best = F.least(*metrics)
    pick = F.when(metrics[0] == best, F.lit(0))
    for i in range(1, len(buckets)):
        pick = pick.when(metrics[i] == best, F.lit(i))
    shard = F.pmod(
        hash_family(hash_kind)(F.col(id_col).cast("string"), "abucket"),
        F.lit(n_shards),
    ).cast("long")
    base = spread_small_scan(imgs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.col(w_col).cast("long").alias("w"),
        F.col(h_col).cast("long").alias("h"),
        pick.cast("long").alias("bucket"),
        shard.alias("shard"),
    )
    barr = {i: (bw, bh) for i, (bw, bh) in enumerate(buckets)}
    bw_expr = F.when(F.col("bucket") == 0, F.lit(barr[0][0]))
    bh_expr = F.when(F.col("bucket") == 0, F.lit(barr[0][1]))
    for i in range(1, len(buckets)):
        bw_expr = bw_expr.when(F.col("bucket") == i, F.lit(barr[i][0]))
        bh_expr = bh_expr.when(F.col("bucket") == i, F.lit(barr[i][1]))
    w = Window.partitionBy("bucket", "shard").orderBy("doc_id")
    # integer `div` (not floor of a float division) keeps batch ids
    # engine-exact — same rule as pack_offsets' bin arithmetic.
    return base.withColumn(
        "_rn", (F.row_number().over(w) - 1).cast("long")
    ).select(
        "doc_id",
        "w",
        "h",
        "bucket",
        bw_expr.cast("long").alias("bw"),
        bh_expr.cast("long").alias("bh"),
        "shard",
        F.expr(f"_rn div {int(batch_size)}").cast("long").alias("batch_idx"),
        F.expr(f"_rn % {int(batch_size)}").cast("long").alias("slot"),
    )
