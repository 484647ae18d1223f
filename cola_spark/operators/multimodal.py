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


def phash_decontam(
    corpus_feats: DataFrame, bench_feats: DataFrame,
    max_hamming: int = 1, bands: int = 4,
    id_col: str = "image_id", hash_col: str = "phash",
) -> DataFrame:
    """(image_id, best_hamming, contaminated): the image mirror of
    benchmark decontamination — flag every corpus image whose perceptual
    hash is within max_hamming of ANY benchmark image.

    Scale shape (the text decontam argument, on the pHash axis): an
    eval image set is small by construction, so its band rows are
    BROADCAST; each corpus image meets only bench images sharing one of
    its `bands` 16-bit pHash bands — a map-side broadcast equi-join, no
    corpus-scale shuffle except the final per-image min groupBy. For
    max_hamming <= bands-1 the pigeonhole guarantee makes the gate
    EXACT (a missed leak is a correctness bug, not a recall number):
    <= bands-1 differing bits cannot dirty all bands, so every within-
    radius pair shares a band and is verified by bit_count(xor).

    best_hamming is -1 for clean images (no bench hash within radius).
    """
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} breaks the exactness guarantee "
            f"(needs <= bands-1 = {bands - 1})"
        )
    bits = 64 // bands
    mask = (1 << bits) - 1

    def band_rows(df: DataFrame, idn: str, hn: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(idn),
            F.col(hash_col).alias(hn),
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.shiftright(F.col(hash_col), bits * b)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ])
            ).alias("bd"),
        ).select(idn, hn, "bd.band_id", "bd.band_val")

    c = band_rows(corpus_feats, "_cid", "_ch")
    b = band_rows(bench_feats, "_bid", "_bh").select(
        "band_id", "band_val", "_bh"
    ).distinct()
    hits = (
        c.join(F.broadcast(b), ["band_id", "band_val"])
        .select(
            "_cid",
            F.bit_count(F.col("_ch").bitwiseXOR(F.col("_bh"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .groupBy("_cid")
        .agg(F.min("hamming").cast("long").alias("best_hamming"))
    )
    return (
        corpus_feats.select(F.col(id_col).alias("image_id"))
        .join(hits.withColumnRenamed("_cid", "image_id"), "image_id", "left")
        .select(
            "image_id",
            F.coalesce(F.col("best_hamming"), F.lit(-1)).cast("long").alias("best_hamming"),
            F.col("best_hamming").isNotNull().alias("contaminated"),
        )
    )


def caption_consolidate(
    docs: DataFrame, pairs: DataFrame,
    id_col: str = "doc_id", text_col: str = "text",
    a_col: str = "doc_a", b_col: str = "doc_b",
    strategy: str = "rep",
) -> DataFrame:
    """Cross-modal caption consolidation: collapse each near-dup IMAGE
    cluster (pairs from phash_near_dup_pairs or any banded join) to one
    canonical caption; singletons keep their own. Returns
    (id, cluster_id, is_rep, canon_caption). is_rep always marks the
    minimum-id member (the dedup keep-set representative) — the keep
    flag downstream dedup uses — independent of caption strategy.

    strategy:
      "rep"     — the representative (minimum-id) member's text.
      "longest" — the longest member caption, ties to the smaller id
                  (the LAION-style 'pick the most descriptive caption'
                  heuristic; deterministic total order).

    Scale shape: connected components over the pair list (graph-sized,
    operators/clusters.py), one left join to extend cluster ids to the
    full corpus, then for "rep" a join against the corpus keyed by
    cluster_id (cluster_id IS the minimum member id under min-label CC,
    so no per-cluster aggregate over text is needed); for "longest" one
    cluster-keyed max_by((length, -id)) aggregate — map-side
    combinable, no window sort."""
    from cola_spark.operators.clusters import dedup_keep_set

    base = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_txt"))
    ks = dedup_keep_set(pairs, a_col, b_col)
    withc = base.join(ks.select("doc_id", "cluster_id"), "doc_id", "left").select(
        "doc_id", "_txt",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
    )
    if strategy == "rep":
        canon = base.select(
            F.col("doc_id").alias("cluster_id"), F.col("_txt").alias("canon_caption")
        )
    elif strategy == "longest":
        canon = withc.groupBy("cluster_id").agg(
            F.max_by(
                "_txt",
                F.struct(
                    F.length("_txt").alias("l"),
                    (-F.col("doc_id")).alias("nid"),
                ),
            ).alias("canon_caption")
        )
    else:
        raise ValueError(f"strategy must be rep|longest, got {strategy!r}")
    return withc.join(canon, "cluster_id").select(
        F.col("doc_id").alias(id_col),
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_rep"),
        "canon_caption",
    )


# ------------------------------------------------- image-text alignment


def embedding_grid(
    embs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    grid: int = 1000,
) -> DataFrame:
    """Long-format INTEGER-grid view of a float embedding column:
    (doc_id, j, ie) with ie = floor(double(e_j) * grid).

    The cast to double happens BEFORE the multiply so the product is
    one IEEE-double op on the exact float32 value — any engine that
    widens the same way (DuckDB `CAST(x AS DOUBLE) * grid`) lands on
    the identical integer, which is what makes every downstream
    dot/norm exactly replayable. Map-side only (posexplode, no
    shuffle); at corpus scale the long form rides the scan's
    partitioning by id."""
    return embs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(vec_col).alias("j", "_e")
    ).select(
        "doc_id",
        "j",
        F.floor(F.col("_e").cast("double") * grid).cast("long").alias("ie"),
    )


def caption_text_embed(
    docs: DataFrame,
    dim: int = 64,
    val_mod: int = 201,
    hash_kind: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed bag-of-words caption embedding in integer arithmetic:
    every whitespace token contributes val(tok) ∈ [-(val_mod-1)/2,
    +(val_mod-1)/2] to dimension dim(tok) — the feature-hashing trick
    (Weinberger et al. 2009), the stand-in for a real text encoder
    whose weights this sandbox doesn't ship. Returns the SPARSE long
    form (doc_id, j, cv); absent dims are implicit zeros.

    hash_kind="md5" is the cross-engine family (textdedup.hash_family)
    used by the DuckDB oracle; xxhash64 is the scale default. Shape:
    one explode + one map-side-combinable groupBy keyed (doc_id, j)."""
    from cola_spark.operators.textdedup import hash_family

    h = hash_family(hash_kind)
    half = (val_mod - 1) // 2
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    return (
        toks.select(
            "doc_id",
            F.pmod(h(F.col("tok"), "cd"), F.lit(dim)).cast("int").alias("j"),
            (F.pmod(h(F.col("tok"), "cv"), F.lit(val_mod)) - half)
            .cast("long")
            .alias("cv"),
        )
        .groupBy("doc_id", "j")
        .agg(F.sum("cv").alias("cv"))
    )


def caption_align(
    img_vec: DataFrame,
    cap_vec: DataFrame,
    thr_num: int = 7,
    thr_den: int = 25,
) -> DataFrame:
    """CLIP-score-style image<->caption alignment gate — LAION's core
    curation filter (keep pairs whose image/text embedding cosine
    clears a threshold; 0.28 = 7/25 for LAION-400M) — in EXACT integer
    arithmetic so the decision replays bit-for-bit in any engine:

        aligned  <=>  dot > 0  AND  thr_den²·dot² >= thr_num²·na·nb
                 <=>  cos(img, cap) >= thr_num / thr_den

    Inputs are long-format integer vectors: img_vec (doc_id, j, ie)
    from embedding_grid (dense — every dim present), cap_vec
    (doc_id, j, cv) from caption_text_embed (sparse — missing dims are
    zeros, supplied by the left join). Output is the complete decision
    table (doc_id, dot, na, nb, aligned), not just survivors, so
    downstream can audit the gate.

    int64 headroom: |dot| <= D·max|ie|·max|cv|, the guard products are
    thr_den²·dot² and thr_num²·na·nb — for D=64, grid=1000 (|ie|<=~1000
    on unit-norm-ish embeddings) and caption values bounded by a few
    thousand, both sit around 1e17, inside int64 (~9.2e18); the oracle
    pins it because a DuckDB overflow would error, not wrap.

    Scale shape: both sides keyed (doc_id, j) — the join co-partitions
    on doc_id (one exchange each side at most; none when the embedding
    store is already bucketed by doc), and the per-doc reduction is a
    map-side-combinable groupBy. No window, no driver collect."""
    joined = img_vec.join(cap_vec, ["doc_id", "j"], "left").select(
        "doc_id", "ie", F.coalesce(F.col("cv"), F.lit(0)).alias("cv")
    )
    agg = joined.groupBy("doc_id").agg(
        F.sum(F.col("ie") * F.col("cv")).alias("dot"),
        F.sum(F.col("ie") * F.col("ie")).alias("na"),
        F.sum(F.col("cv") * F.col("cv")).alias("nb"),
    )
    aligned = (F.col("dot") > 0) & (
        F.lit(thr_den * thr_den) * F.col("dot") * F.col("dot")
        >= F.lit(thr_num * thr_num) * F.col("na") * F.col("nb")
    )
    return agg.select("doc_id", "dot", "na", "nb", aligned.alias("aligned"))


# ------------------------------------------------------------------ audio


def audio_features(audios: DataFrame) -> DataFrame:
    """Decode → per-clip features: duration_ms, RMS energy x1000,
    zero-crossing count, peak amplitude x1000 (all integer-exact, the
    audio twin of image_features). Real lossy formats (mp3/opus) raise
    at the codec dispatch; the Arrow plumbing is format-agnostic."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cola_spark.codecs import decode_audio

        for pdf in it:
            rows = []
            for audio_id, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                s, sr = decode_audio(bytes(data), fmt)
                x = s.astype(np.float64) / 32768.0
                rms = int(np.sqrt(np.mean(x * x)) * 1000)
                zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
                rows.append((
                    audio_id, sr, len(s), len(s) * 1000 // sr,
                    rms, zc, int(np.abs(x).max() * 1000),
                ))
            yield pd.DataFrame(
                rows,
                columns=["audio_id", "sample_rate", "n_samples", "duration_ms",
                         "rms_x1000", "zero_crossings", "peak_x1000"],
            )

    return audios.select("audio_id", "bytes", "fmt").mapInPandas(
        batches,
        "audio_id string, sample_rate int, n_samples int, duration_ms long,"
        " rms_x1000 long, zero_crossings long, peak_x1000 long",
    )


def audio_resample(audios: DataFrame, sr_to: int) -> DataFrame:
    """Decode → nearest-neighbour resample to ``sr_to`` → re-encode
    WAVF (the resize_images twin). Output schema mirrors the input."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from cola_spark.codecs import decode_audio, encode_audio, resample_nn

        for pdf in it:
            rows = []
            for audio_id, data, fmt in zip(pdf["audio_id"], pdf["bytes"], pdf["fmt"]):
                s, sr = decode_audio(bytes(data), fmt)
                s2 = resample_nn(s, sr, sr_to)
                rows.append((audio_id, encode_audio(s2, sr_to, "wavf"),
                             sr_to, len(s2), "wavf"))
            yield pd.DataFrame(
                rows, columns=["audio_id", "bytes", "sample_rate", "n_samples", "fmt"]
            )

    return audios.select("audio_id", "bytes", "fmt").mapInPandas(
        batches,
        "audio_id string, bytes binary, sample_rate int, n_samples int, fmt string",
    )


def caption_to_image_topk(
    cap_vec: DataFrame,
    img_vec: DataFrame,
    k: int = 5,
    cand: DataFrame | None = None,
) -> DataFrame:
    """Cross-modal retrieval — for each caption query vector, the top-k
    images by cosine against the image embeddings: the text->image
    search a LAION-style corpus serves, and the retrieval twin of the
    caption_align GATE (align asks "is THIS pair good", retrieval asks
    "which images fit this text").

    Inputs are the alignment stack's long integer forms: cap_vec
    (query_id, j, cv) sparse from caption_text_embed, img_vec
    (image_id, j, ie) dense from embedding_grid. Output: (query_id,
    image_id, dot, rank), rank 1..k per query. dot is exact int64;
    the ordering key dot / sqrt(na*nb) is ONE IEEE divide over ONE
    IEEE sqrt of exact int64 inputs — bit-identical in any IEEE-754
    engine (both ops are correctly rounded), ties broken by image_id —
    and stays OUT of the output: floats order, integers leave.

    Scale shape: the query batch is config-scale (a search request),
    so it broadcasts to the corpus — the dot join is map-side on j,
    the reduction one map-side-combinable groupBy (query_id,
    image_id); image norms are corpus-derived (shuffle_hash by the
    no-auto-broadcast rule), query norms broadcast. Per-query top-k is
    a window over the query's candidate list — the ann_cosine_topk
    brute-force convention; at 10^10 images pass ``cand`` (a
    (query_id, image_id) shortlist, e.g. IVF-pruned — see
    caption_to_image_topk_ivf) and only shortlisted dots are ever
    computed: the restriction joins BEFORE the reduction."""
    cap = cap_vec.select(
        F.col("doc_id").alias("query_id"), "j", F.col("cv").cast("long").alias("cv")
    )
    img = img_vec.select(
        F.col("doc_id").alias("image_id"), "j", F.col("ie").cast("long").alias("ie")
    )
    if cand is None:
        pairs = img.join(F.broadcast(cap), "j")
    else:
        pairs = img.join(cand.hint("shuffle_hash"), "image_id").join(
            F.broadcast(cap), ["query_id", "j"]
        )
    dots = (
        pairs.groupBy("query_id", "image_id")
        .agg(F.sum(F.col("ie") * F.col("cv")).cast("long").alias("dot"))
    )
    na = img.groupBy("image_id").agg(
        F.sum(F.col("ie") * F.col("ie")).cast("long").alias("na")
    )
    nb = cap.groupBy("query_id").agg(
        F.sum(F.col("cv") * F.col("cv")).cast("long").alias("nb")
    )
    from pyspark.sql import Window

    score = F.col("dot").cast("double") / F.sqrt(
        (F.col("na") * F.col("nb")).cast("double")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("_s"), F.asc("image_id")
    )
    return (
        dots.join(na.hint("shuffle_hash"), "image_id")
        .join(F.broadcast(nb), "query_id")
        .withColumn("_s", score)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= int(k))
        .select("query_id", "image_id", "dot", "rank")
    )


def caption_to_image_topk_ivf(
    cap_vec: DataFrame,
    embs: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    nprobe: int = 2,
    train_iters: int = 3,
    train_permille: int = 1000,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-pruned cross-modal retrieval — the 10^10-image serving path
    of caption_to_image_topk: candidates are restricted to the query's
    ``nprobe`` nearest Lloyd-TRAINED k-means cells (the same coarse
    quantizer as ann_ivf/semdedup), then the exact integer ranker runs
    unchanged on the shortlist. The caption query vector lives in the
    image embedding space by construction (the hashed-BoW dims align
    with the grid dims), so ONE quantizer serves both modalities —
    exactly how a production CLIP index works (text and image towers
    share the space; the index is built once on the image side).

    Scale shape: centroids are n_cells broadcast rows; image cell
    assignment is the map-side fold (no shuffle); the query batch and
    its probed cells are config-scale and broadcast into the
    cell-keyed candidate join; only shortlisted dots are computed
    (corpus work per query drops from N to ~nprobe·N/n_cells). Output
    schema matches the brute ranker: (query_id, image_id, dot, rank).
    """
    from cola_spark.operators.similarity import _assign_cells, ivf_cells
    from cola_spark.operators.textdedup import spread_small_scan

    cents = ivf_cells(
        embs, n_cells, id_col, vec_col,
        train_iters=train_iters, train_permille=train_permille,
    )
    img_cell = _assign_cells(
        spread_small_scan(embs, id_col).select(
            F.col(id_col).alias("image_id"), F.col(vec_col).alias("_v")
        ),
        cents, nprobe=1,
    ).select("image_id", "cell")
    cap = cap_vec.select(
        F.col("doc_id").alias("query_id"), "j", F.col("cv").cast("long").alias("cv")
    )
    qdense = (
        cap.groupBy("query_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("j", "cv"))).alias("_m"))
        .select(
            "query_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(int(dim) - 1)),
                lambda i: F.coalesce(F.element_at(F.col("_m"), i), F.lit(0)).cast(
                    "double"
                ),
            ).alias("_v"),
        )
    )
    q_cell = _assign_cells(qdense, cents, nprobe=nprobe).select("query_id", "cell")
    cand = img_cell.join(F.broadcast(q_cell), "cell").select("query_id", "image_id")
    img_grid = embedding_grid(embs)
    return caption_to_image_topk(cap_vec, img_grid, k=k, cand=cand)


# ------------------------------------------------------------- sniffing


MAGIC_RULES = [
    ("png", "89504E47", 1),
    ("jpeg", "FFD8FF", 1),
    ("gif", "47494638", 1),
]


def sniff_format(df: DataFrame, bytes_col: str = "bytes"):
    """Magic-byte container sniffing over the raw binary column — the
    content-type-lie gate (round 5): on the open web the declared
    Content-Type/extension routinely disagrees with the payload, and
    the decode dispatch (codecs/__init__) must trust the BYTES.
    Returns a string column: png/jpeg/gif by prefix magic, webp by
    RIFF container magic + the 'WEBP' fourcc at offset 9, else
    'unknown'. Pure scalar comparisons on hex(bytes) slices (DuckDB has
    no BLOB substring, so both engines slice the hex string — one hex()
    + substr per probe, codegen-side, no Python), exactly replayable in
    any engine, unlike a decoder probe."""
    hx = F.hex(F.col(bytes_col))

    def is_magic(hexs: str, pos: int):
        return F.substring(hx, 2 * pos - 1, len(hexs)) == hexs

    out = F.lit("unknown")
    out = F.when(
        is_magic("52494646", 1) & is_magic("57454250", 9), F.lit("webp")
    ).otherwise(out)
    for name, hexs, pos in reversed(MAGIC_RULES):
        out = F.when(is_magic(hexs, pos), F.lit(name)).otherwise(out)
    return out


def consensus_dedup_pairs(
    pairs: DataFrame,
    captions: DataFrame,
    a_col: str = "img_a",
    b_col: str = "img_b",
    id_col: str = "image_id",
    cap_col: str = "caption",
) -> DataFrame:
    """Two-signal image dedup: pHash near-dup pairs annotated with the
    caption agreement of their endpoints — (a, b, hamming,
    caption_match, consensus).

    A single perceptual signal over-merges at web scale: pHash at
    Hamming <= r collapses crops/re-encodes of the SAME image but also
    borderline distinct images (solid-color banners, templated product
    shots). LAION-style pipelines raise precision by requiring a
    SECOND independent modality to agree; here that is caption
    fingerprint equality (md5 of the lowercased, whitespace-trimmed
    caption — exact after normalization; swap in a shingle fingerprint
    for fuzzier text without touching the shape). `consensus` pairs
    are safe auto-drops; pHash-only pairs stay flagged for the
    keep-best-resolution path instead of silent deletion.

    Shape: the pair list is already the banded near-dup output
    (pair-scale, not corpus² — multimodal.phash_near_dup_pairs); the
    caption signal is TWO id-keyed joins against the caption table
    (the same key class every image join here uses). No new exchange
    class, no window, no Python."""
    fp = F.md5(F.lower(F.trim(F.col(cap_col))).cast("binary"))
    caps = captions.select(
        F.col(id_col).alias("_cid"), fp.alias("_fp")
    )
    a = pairs.join(
        caps.withColumnRenamed("_cid", a_col).withColumnRenamed(
            "_fp", "_fp_a"
        ),
        a_col,
    )
    ab = a.join(
        caps.withColumnRenamed("_cid", b_col).withColumnRenamed(
            "_fp", "_fp_b"
        ),
        b_col,
    )
    match = F.col("_fp_a") == F.col("_fp_b")
    return ab.select(
        a_col,
        b_col,
        F.col("hamming").cast("long").alias("hamming"),
        match.alias("caption_match"),
        match.alias("consensus"),
    )
