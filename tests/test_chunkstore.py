"""Incremental CDC chunk store (operators/chunkstore.py): exact
reconstruction, delta-only storage across re-crawl snapshots, pinned
chunking params, crash-orphan sweep, and the object-store backend."""

from __future__ import annotations

import pytest

from cola_spark.operators.chunkstore import (
    ingest_snapshot, reconstruct_snapshot, store_stats,
)
from cola_spark.stateio import LocalStateIO, ObjectStoreStateIO

KW = dict(w=4, mask_bits=2, hash_kind="md5")


def _words(lo, hi):
    return " ".join(f"t{i * 6007 % 4099}" for i in range(lo, hi))


def _snapshot_a(spark):
    rows = [(f"d{i}", _words(i * 3, i * 3 + 120)) for i in range(12)]
    return spark.createDataFrame(rows, "doc_id string, text string"), dict(rows)


def _snapshot_b(spark):
    """The re-crawl: 3 docs edited (prepend / mid-edit / append), the
    other 9 unchanged."""
    rows = [(f"d{i}", _words(i * 3, i * 3 + 120)) for i in range(12)]
    ed = dict(rows)
    ed["d0"] = "breaking news banner " + ed["d0"]
    mid = ed["d5"].split()
    mid[60] = "EDITED"
    ed["d5"] = " ".join(mid)
    ed["d9"] = ed["d9"] + " new trailing comment thread"
    rows = sorted(ed.items())
    return spark.createDataFrame(rows, "doc_id string, text string"), ed


def _check_exact(spark, path, sid, want, io):
    got = {
        r.doc_id: r.text
        for r in reconstruct_snapshot(spark, path, sid, io=io).collect()
    }
    assert got == want


@pytest.mark.parametrize("io_cls", [LocalStateIO, ObjectStoreStateIO])
def test_ingest_delta_and_exact_reconstruct(spark, tmp_path, io_cls):
    io = io_cls()
    path = str(tmp_path / "store")
    a, want_a = _snapshot_a(spark)
    st_a = ingest_snapshot(a, path, "2026-08-01", io=io, **KW)
    assert st_a["new_chunks_stored"] > 0
    _check_exact(spark, path, "2026-08-01", want_a, io)

    b, want_b = _snapshot_b(spark)
    st_b = ingest_snapshot(b, path, "2026-08-08", io=io, **KW)
    # 9/12 docs unchanged + CDC locality in the 3 edited ones: the
    # second snapshot must store only a small fraction of its chunks.
    # (Counts aren't monotonic — an edit can erase a boundary and merge
    # two chunks — but they stay close.)
    assert abs(st_b["chunks_in_snapshot"] - st_a["chunks_in_snapshot"]) <= 10
    assert st_b["new_chunks_stored"] < st_b["chunks_in_snapshot"] * 0.25
    assert st_b["dedup_ratio"] > 0.75
    # both snapshots stay exactly reconstructable from the shared packs
    _check_exact(spark, path, "2026-08-08", want_b, io)
    _check_exact(spark, path, "2026-08-01", want_a, io)

    st = store_stats(spark, path, io=io)
    assert st["packs"] == 2 and st["snapshots"] == 2
    assert st["stored_chunks"] < st["refs"]  # the archive's savings


def test_identical_recrawl_stores_nothing(spark, tmp_path):
    io = LocalStateIO()
    path = str(tmp_path / "store")
    a, want = _snapshot_a(spark)
    ingest_snapshot(a, path, "s1", io=io, **KW)
    st = ingest_snapshot(a, path, "s2", io=io, **KW)
    assert st["new_chunks_stored"] == 0
    assert st["dedup_ratio"] == 1.0
    _check_exact(spark, path, "s2", want, io)


def test_param_pin_and_duplicate_snapshot(spark, tmp_path):
    io = LocalStateIO()
    path = str(tmp_path / "store")
    a, _ = _snapshot_a(spark)
    ingest_snapshot(a, path, "s1", io=io, **KW)
    with pytest.raises(ValueError, match="built with"):
        ingest_snapshot(a, path, "s2", io=io, w=4, mask_bits=3,
                        hash_kind="md5")
    with pytest.raises(ValueError, match="already committed"):
        ingest_snapshot(a, path, "s1", io=io, **KW)


def test_crash_orphan_swept_and_uncommitted_invisible(spark, tmp_path):
    io = LocalStateIO()
    path = str(tmp_path / "store")
    a, want = _snapshot_a(spark)
    ingest_snapshot(a, path, "s1", io=io, **KW)
    # simulate a crash AFTER pack/snap writes, BEFORE the manifest flip
    b, _ = _snapshot_b(spark)
    b.limit(2).write.parquet(f"{path}/pack=1")
    b.limit(2).write.parquet(f"{path}/snap=ghost")
    with pytest.raises(FileNotFoundError):
        reconstruct_snapshot(spark, path, "ghost", io=io)
    st = ingest_snapshot(b, path, "s2", io=io, **KW)  # sweeps orphans
    assert st["pack_id"] == 1  # orphan pack id was reclaimed, not skipped
    _check_exact(spark, path, "s1", want, io)
    import os
    assert not os.path.exists(f"{path}/snap=ghost")


def test_expire_and_compact_reclaims_only_dead_chunks(spark, tmp_path):
    io = LocalStateIO()
    path = str(tmp_path / "store")
    from cola_spark.operators.chunkstore import compact_store, expire_snapshot

    a, _ = _snapshot_a(spark)
    b, want_b = _snapshot_b(spark)
    ingest_snapshot(a, path, "s1", io=io, **KW)
    ingest_snapshot(b, path, "s2", io=io, **KW)
    before = store_stats(spark, path, io=io)

    expire_snapshot(path, "s1", io=io)
    with pytest.raises(FileNotFoundError):
        reconstruct_snapshot(spark, path, "s1", io=io)
    # expiry alone reclaims nothing (packs immutable)
    assert store_stats(spark, path, io=io)["stored_chunks"] == before[
        "stored_chunks"
    ]

    m = compact_store(spark, path, io=io)
    assert len(m["packs"]) == 1
    after = store_stats(spark, path, io=io)
    # compaction keeps EXACTLY s2's live chunk set
    live = (
        spark.read.parquet(f"{path}/snap=s2")
        .select("chunk_hash").distinct().count()
    )
    assert after["stored_chunks"] == live < before["stored_chunks"]
    _check_exact(spark, path, "s2", want_b, io)


def test_compact_all_live_is_lossless(spark, tmp_path):
    io = ObjectStoreStateIO()
    path = str(tmp_path / "store")
    from cola_spark.operators.chunkstore import compact_store

    a, want_a = _snapshot_a(spark)
    b, want_b = _snapshot_b(spark)
    ingest_snapshot(a, path, "s1", io=io, **KW)
    ingest_snapshot(b, path, "s2", io=io, **KW)
    before = store_stats(spark, path, io=io)
    compact_store(spark, path, io=io)
    after = store_stats(spark, path, io=io)
    assert after["stored_chunks"] == before["stored_chunks"]
    assert after["packs"] == 1
    _check_exact(spark, path, "s1", want_a, io)
    _check_exact(spark, path, "s2", want_b, io)


def test_merkle_tree_sequential_replay_and_divergence(spark):
    """Root replayed in Python (incl. odd-tail promotion); equal leaf
    sets agree on the root; one flipped leaf changes it and the
    divergence is locatable down a single path."""
    import hashlib

    import pyspark.sql.functions as F  # noqa: N812

    from cola_spark.operators.chunkstore import merkle_tree

    def py_levels(hs):
        levels = [list(hs)]
        while len(levels[-1]) > 1:
            prev, nxt = levels[-1], []
            for i in range(0, len(prev), 2):
                if i + 1 < len(prev):
                    nxt.append(
                        hashlib.md5(
                            (prev[i] + prev[i + 1]).encode()
                        ).hexdigest()
                    )
                else:
                    nxt.append(prev[i])  # lone-node promotion
            levels.append(nxt)
        return levels

    hs = [hashlib.md5(f"leaf:{i}".encode()).hexdigest() for i in range(13)]
    df = spark.createDataFrame(list(enumerate(hs)), "idx long, h string")
    got = merkle_tree(df, levels=4).collect()
    exp = py_levels(hs)
    for r in got:
        assert exp[r.level][r.idx] == r.h
    root = [r.h for r in got if r.level == 4]
    assert root == exp[4]

    # flip one leaf: root changes, and exactly one node per level does
    hs2 = list(hs)
    hs2[5] = hashlib.md5(b"tampered").hexdigest()
    df2 = spark.createDataFrame(list(enumerate(hs2)), "idx long, h string")
    got2 = {(r.level, r.idx): r.h for r in merkle_tree(df2, levels=4).collect()}
    got1 = {(r.level, r.idx): r.h for r in got}
    diffs = [k for k in got1 if got1[k] != got2[k]]
    assert (0, 5) in diffs and (4, 0) in diffs
    per_level = {}
    for lv, _ in diffs:
        per_level[lv] = per_level.get(lv, 0) + 1
    assert all(c == 1 for c in per_level.values())  # a single audit path
