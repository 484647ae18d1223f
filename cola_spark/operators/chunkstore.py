"""Incremental CDC chunk store — the crawl archive the chunking
operator exists for.

A re-crawled page usually differs from its previous snapshot by a
small edit; content-defined chunking (textdedup.cdc_chunks) makes the
unchanged regions re-chunk identically, so an archive that stores
chunks content-addressed pays only for the CHANGED chunks of each
snapshot (the git/restic pack model). No reference analogue — cola
stores raw pages per fetch; at 10^10 URLs with weekly re-crawls the
raw model stores each page ~50x, this one ~1x + deltas.

Layout under <path>/ (same commit discipline as ann_index.py):
  manifest.json                  commit point, atomic via StateIO:
                                 {"rev", "w", "mask_bits", "hash_kind",
                                  "packs": [ids], "snapshots": {sid: pack}}
  pack=K/                        parquet (chunk_hash, tok_len, chunk_text)
                                 — ONLY the chunks no earlier pack holds;
                                 packs are immutable once committed
  snap=SID/                      parquet (doc_id, s, e, chunk_hash) —
                                 the recipe that reassembles a snapshot

Crash safety: pack and snapshot dirs are fully written BEFORE the
manifest flips; a crash mid-ingest leaves the previous manifest
servable and an orphan pack/snap dir that the next successful ingest
sweeps (single-writer, like the scheduler's compaction protocol).

Scale shape: the ingest-side join is new-chunk discovery — an anti
join of this snapshot's distinct chunk hashes against the committed
pack index, both hash-partitioned on uniform md5 keys (no skew). The
reconstruct-side join is snapshot-recipe ⋈ packs on the same keys.
Chunk TEXT rides only the pack write (each chunk's bytes written once
ever); recipes are 3 longs + a 32-char hash per chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cola_spark.stateio import DEFAULT_IO, StateIO

_PARAMS = ("w", "mask_bits", "hash_kind")


def _manifest(io: StateIO, path: str) -> dict | None:
    return io.read_json(f"{path}/manifest.json")


def ingest_snapshot(
    docs: DataFrame,
    path: str,
    snapshot_id: str,
    w: int = 4,
    mask_bits: int = 3,
    hash_kind: str = "xxhash64",
    id_col: str = "doc_id",
    text_col: str = "text",
    io: StateIO = DEFAULT_IO,
) -> dict:
    """Chunk `docs`, store only the chunks absent from every committed
    pack, commit the snapshot recipe. Returns ingest stats. Chunking
    parameters are pinned by the first ingest (chunk identity depends
    on them); a mismatch raises."""
    from cola_spark.operators.textdedup import cdc_chunks

    spark = docs.sparkSession
    m = _manifest(io, path)
    params = {"w": int(w), "mask_bits": int(mask_bits), "hash_kind": hash_kind}
    if m is not None:
        pinned = {k: m[k] for k in _PARAMS}
        if pinned != params:
            raise ValueError(
                f"chunk store at {path} was built with {pinned}, got {params}"
            )
        if snapshot_id in m["snapshots"]:
            raise ValueError(f"snapshot {snapshot_id!r} already committed")
    else:
        m = {"rev": -1, **params, "packs": [], "snapshots": {}}

    # sweep orphans from a previous crashed ingest (single-writer)
    committed = {f"pack={k}" for k in m["packs"]} | {
        f"snap={s}" for s in m["snapshots"]
    }
    for d in io.list_dirs(f"{path}/pack=*") + io.list_dirs(f"{path}/snap=*"):
        if d.rstrip("/").rsplit("/", 1)[-1] not in committed:
            io.remove_dir(d)

    chunks = cdc_chunks(
        docs, w, mask_bits, hash_kind, id_col, text_col, with_text=True
    ).localCheckpoint()  # one evaluation feeds recipe, dedup and stats
    recipe = chunks.select("doc_id", "s", "e", "chunk_hash")
    uniq = chunks.select("chunk_hash", "tok_len", "chunk_text").dropDuplicates(
        ["chunk_hash"]
    )
    if m["packs"]:
        idx = spark.read.parquet(*[f"{path}/pack={k}" for k in m["packs"]])
        fresh = uniq.join(
            idx.select("chunk_hash").hint("shuffle_hash"), "chunk_hash",
            "left_anti",
        )
    else:
        fresh = uniq

    pack_id = (m["packs"][-1] + 1) if m["packs"] else 0
    fresh.write.mode("overwrite").parquet(f"{path}/pack={pack_id}")
    recipe.write.mode("overwrite").parquet(f"{path}/snap={snapshot_id}")
    n_new = spark.read.parquet(f"{path}/pack={pack_id}").count()
    n_total = recipe.count()

    m2 = {
        "rev": m["rev"] + 1, **params,
        "packs": m["packs"] + [pack_id],
        "snapshots": {**m["snapshots"], snapshot_id: pack_id},
    }
    io.write_json_atomic(f"{path}/manifest.json", m2)  # commit
    return {
        "snapshot_id": snapshot_id, "pack_id": pack_id,
        "chunks_in_snapshot": n_total, "new_chunks_stored": n_new,
        "dedup_ratio": round(1.0 - (n_new / n_total), 4) if n_total else 0.0,
    }


def reconstruct_snapshot(
    spark: SparkSession, path: str, snapshot_id: str, io: StateIO = DEFAULT_IO
) -> DataFrame:
    """(doc_id, text): reassemble a committed snapshot exactly — the
    recipe joins the content-addressed packs on chunk_hash and chunks
    concatenate in range order. Exactness is the whole contract; the
    test suite pins byte equality against the ingested text."""
    m = _manifest(io, path)
    if m is None or snapshot_id not in m["snapshots"]:
        raise FileNotFoundError(f"no committed snapshot {snapshot_id!r} at {path}")
    recipe = spark.read.parquet(f"{path}/snap={snapshot_id}")
    packs = spark.read.parquet(*[f"{path}/pack={k}" for k in m["packs"]])
    return (
        recipe.join(packs.select("chunk_hash", "chunk_text"), "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.struct("s", "chunk_text")))
                .getField("chunk_text"),
                " ",
            ).alias("text")
        )
    )


def store_stats(
    spark: SparkSession, path: str, io: StateIO = DEFAULT_IO
) -> dict:
    """Totals across the committed store (chunks stored once ever vs
    chunk references across snapshots — the archive's savings factor)."""
    m = _manifest(io, path)
    if m is None:
        return {"packs": 0, "snapshots": 0, "stored_chunks": 0, "refs": 0}
    stored = spark.read.parquet(
        *[f"{path}/pack={k}" for k in m["packs"]]
    ).count()
    refs = sum(
        spark.read.parquet(f"{path}/snap={s}").count() for s in m["snapshots"]
    )
    return {
        "packs": len(m["packs"]), "snapshots": len(m["snapshots"]),
        "stored_chunks": stored, "refs": refs,
    }


def expire_snapshot(
    path: str, snapshot_id: str, io: StateIO = DEFAULT_IO
) -> dict:
    """Drop a snapshot's recipe from the committed store (Iceberg
    expire-snapshot shape). Chunk bytes are NOT reclaimed here — packs
    are immutable and may serve other snapshots; compact_store() does
    the space reclamation. Manifest flip first, dir sweep after (a
    crash between the two leaves an orphan the next ingest sweeps)."""
    m = _manifest(io, path)
    if m is None or snapshot_id not in m["snapshots"]:
        raise FileNotFoundError(f"no committed snapshot {snapshot_id!r} at {path}")
    m2 = {**m, "rev": m["rev"] + 1,
          "snapshots": {k: v for k, v in m["snapshots"].items()
                        if k != snapshot_id}}
    io.write_json_atomic(f"{path}/manifest.json", m2)  # commit
    io.remove_dir(f"{path}/snap={snapshot_id}")
    return m2


def compact_store(
    spark: SparkSession, path: str, io: StateIO = DEFAULT_IO
) -> dict:
    """Rewrite the pack set down to the chunks some LIVE snapshot still
    references (restic prune / Iceberg rewrite_data_files shape) —
    run after expire_snapshot to reclaim the expired chunks' bytes.

    One new pack holds the live set (left-semi join of the old packs
    against the union of live recipes, both sides keyed on uniform md5
    hashes); the manifest flips to it atomically, then the superseded
    pack dirs are removed. A crash before the flip leaves the old
    manifest fully servable and an orphan pack the next ingest sweeps;
    a crash after the flip leaves stale committed-in-the-past dirs for
    the same sweep. Readers never see a partial store."""
    m = _manifest(io, path)
    if m is None:
        raise FileNotFoundError(f"no committed chunk store at {path}")
    if not m["packs"]:
        return m
    old_packs = [f"{path}/pack={k}" for k in m["packs"]]
    new_id = m["packs"][-1] + 1
    packs = spark.read.parquet(*old_packs)
    if m["snapshots"]:
        live = spark.read.parquet(
            *[f"{path}/snap={s}" for s in m["snapshots"]]
        ).select("chunk_hash").distinct()
        kept = packs.join(live.hint("shuffle_hash"), "chunk_hash", "left_semi")
    else:
        kept = packs.limit(0)
    kept.write.mode("overwrite").parquet(f"{path}/pack={new_id}")

    m2 = {**m, "rev": m["rev"] + 1, "packs": [new_id],
          "snapshots": {s: new_id for s in m["snapshots"]}}
    io.write_json_atomic(f"{path}/manifest.json", m2)  # commit
    for p in old_packs:
        io.remove_dir(p)
    return m2


# ---------------------------------------------------------------------
# Merkle tree over content hashes (round 5): snapshot INTEGRITY for the
# chunk-store family. Two crawl archives (or a primary and its
# object-store replica, stateio.py) verify equality by comparing ONE
# root hash, and locate a divergence with O(log n) hash exchanges —
# the standard content-addressed-storage audit (git/IPFS shape).
#
# Relational build: level 0 is the sorted leaf-hash list (the only
# corpus-scale pass); every higher level pairs adjacent nodes with one
# combinable groupBy(idx div 2) — exactly one row per parity, so the
# pair concat is MAX(CASE parity) + MAX(CASE parity) — and hashes the
# 64-char concat. Geometrically shrinking exchanges, log2(n) rounds.
# Odd tails promote the lone node unchanged (Bitcoin-style duplication
# would double-count; promotion is the simpler audited rule).


def merkle_tree(
    leaves: DataFrame,
    idx_col: str = "idx",
    hash_col: str = "h",
    levels: int | None = None,
) -> DataFrame:
    """(level, idx, h) for the full tree over (idx, h) leaves —
    level 0 = input, top level = the root (single row). `levels`
    defaults to enough rounds to reach a single node (caller passes it
    explicitly when the count is known; the oracle unrolls it)."""
    from pyspark.sql import functions as F

    cur = leaves.select(
        F.col(idx_col).cast("long").alias("idx"),
        F.col(hash_col).alias("h"),
    )
    if levels is None:
        n = cur.count()
        levels = max(1, (int(n) - 1).bit_length())
    out = [cur.select(F.lit(0).cast("long").alias("level"), "idx", "h")]
    for lv in range(1, levels + 1):
        left = F.max(F.when(F.col("idx") % 2 == 0, F.col("h")))
        right = F.max(F.when(F.col("idx") % 2 == 1, F.col("h")))
        cur = (
            cur.groupBy(F.expr("idx div 2").alias("idx"))
            .agg(
                F.when(right.isNull(), left)
                .otherwise(F.md5(F.concat(left, right).cast("binary")))
                .alias("h")
            )
        )
        out.append(
            cur.select(F.lit(lv).cast("long").alias("level"), "idx", "h")
        )
    u = out[0]
    for f in out[1:]:
        u = u.unionByName(f)
    return u
