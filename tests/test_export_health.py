"""Archive segment export + host health EWMA + retry backoff + robots
TTL refetch planning.

Semantics pinned here (beyond the DuckDB oracle pairs):
  * segment_pack: records are never split — each key appears exactly
    once; per-writer offsets reconstruct a gapless byte stream in key
    order; a segment's total size exceeds the target only via its one
    closing overflow record (size < target + max_record_bytes); a
    record starting exactly on the segment grid opens that segment
    (seg_offset 0);
  * segment_manifest agrees with the layout it summarizes;
  * host_health_ewma: decay is 1/2 per round — the same error burst is
    worth MORE when recent (recency dominance), and the quarantine
    threshold is inclusive (ewma == threshold quarantines);
  * retry_backoff_plan: delay doubles per attempt up to the cap, the
    cap truncates (attempt > cap == attempt == cap, jitter aside), and
    jitter is bounded by jitter_s and a pure function of the URL;
  * robots_refetch_plan: TTL deadline is strict (fetched_at + ttl ==
    now is expired); missing hosts HOLD, expired hosts serve stale,
    fresh hosts serve with zero fetcher work; batches bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cola_spark.operators.export import segment_manifest, segment_pack
from cola_spark.operators.health import host_health_ewma, retry_backoff_plan
from cola_spark.operators.robots import robots_refetch_plan


@pytest.fixture(scope="module")
def layout(spark):
    recs = spark.createDataFrame(
        [(f"k{i:04d}", 100 + (i * 37) % 900) for i in range(400)],
        "key string, nbytes long",
    )
    df = segment_pack(
        recs, segment_bytes=4096, n_writers=4, hash_kind="md5"
    )
    return df, sorted(df.collect(), key=lambda r: (r["writer"], r["key"]))


def test_segment_layout_gapless(layout):
    _, rows = layout
    assert len(rows) == 400  # every record exactly once
    assert len({r["key"] for r in rows}) == 400
    cur_writer, expect_off = None, 0
    for r in rows:
        if r["writer"] != cur_writer:
            cur_writer, expect_off = r["writer"], 0
        glob = r["segment"] * 4096 + r["seg_offset"]
        assert glob == expect_off  # gapless stream in key order
        expect_off += r["nbytes"]


def test_segment_overflow_bound(layout):
    _, rows = layout
    max_rec = max(r["nbytes"] for r in rows)
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault((r["writer"], r["segment"]), []).append(r)
    for (w, s), members in by_seg.items():
        total = sum(r["nbytes"] for r in members)
        assert total < 4096 + max_rec
        # only the LAST record (max offset) may start past nothing:
        # all non-last records end within the grid cell or earlier
        members.sort(key=lambda r: r["seg_offset"])
        for r in members[:-1]:
            assert r["seg_offset"] + r["nbytes"] <= 4096 + max_rec


def test_segment_grid_boundary(spark):
    # one writer (all keys hash wherever — force via n_writers=1);
    # second record starts exactly at the grid -> segment 1, offset 0
    recs = spark.createDataFrame(
        [("a", 4096), ("b", 10), ("c", 4086), ("d", 5)],
        "key string, nbytes long",
    )
    rows = {
        r["key"]: r
        for r in segment_pack(
            recs, segment_bytes=4096, n_writers=1, hash_kind="md5"
        ).collect()
    }
    assert rows["a"]["segment"] == 0 and rows["a"]["seg_offset"] == 0
    assert rows["b"]["segment"] == 1 and rows["b"]["seg_offset"] == 0
    assert rows["c"]["segment"] == 1 and rows["c"]["seg_offset"] == 10
    # d starts at 8192 exactly (10 + 4086 closes the cell) -> segment 2
    assert rows["d"]["segment"] == 2 and rows["d"]["seg_offset"] == 0


def test_manifest_agrees_with_layout(layout):
    df, rows = layout
    man = {
        (r["writer"], r["segment"]): r
        for r in segment_manifest(df).collect()
    }
    by_seg: dict = {}
    for r in rows:
        by_seg.setdefault((r["writer"], r["segment"]), []).append(r)
    assert set(man) == set(by_seg)
    for k, members in by_seg.items():
        assert man[k]["n_records"] == len(members)
        assert man[k]["seg_bytes"] == sum(r["nbytes"] for r in members)
        assert man[k]["first_key"] == min(r["key"] for r in members)
        assert man[k]["last_key"] == max(r["key"] for r in members)


def test_ewma_recency_dominance(spark):
    # same burst (50% errors one round, clean otherwise) — recent beats old
    stats = spark.createDataFrame(
        [
            ("old", 0, 5, 10), ("old", 1, 0, 10), ("old", 2, 0, 10),
            ("new", 0, 0, 10), ("new", 1, 0, 10), ("new", 2, 5, 10),
        ],
        "host string, round long, errs long, fetches long",
    )
    by = {
        r["host"]: r for r in host_health_ewma(stats, 300).collect()
    }
    assert by["new"]["ewma_milli"] > by["old"]["ewma_milli"]
    # exact integer values: weights 1,2,4 (den 7)
    assert by["old"]["ewma_milli"] == 500 * 1 // 7
    assert by["new"]["ewma_milli"] == 500 * 4 // 7
    assert not by["old"]["quarantined"] and not by["new"]["quarantined"]


def test_ewma_threshold_inclusive(spark):
    stats = spark.createDataFrame(
        [("h", 0, 3, 10)], "host string, round long, errs long, fetches long"
    )
    row = host_health_ewma(stats, quarantine_milli=300).collect()[0]
    assert row["ewma_milli"] == 300 and row["quarantined"]


def test_backoff_doubling_and_cap(spark):
    failed = spark.createDataFrame(
        [(7, a) for a in range(10)], "url_id long, attempt long"
    )
    rows = {
        r["attempt"]: r
        for r in retry_backoff_plan(
            failed, now_s=100, base_s=4, attempt_cap=6, jitter_s=16,
            hash_kind="md5",
        ).collect()
    }
    jit = rows[0]["delay_s"] - 4
    assert 0 <= jit < 16  # bounded jitter
    for a in range(10):
        base = 4 << min(a, 6)  # doubling, truncated at the cap
        assert rows[a]["delay_s"] == base + jit  # same URL -> same jitter
        assert rows[a]["next_due_s"] == 100 + base + jit
    assert rows[8]["delay_s"] == rows[6]["delay_s"]


def test_robots_refetch_semantics(spark):
    frontier = spark.createDataFrame(
        [(f"h{i}",) for i in range(12) for _ in range(2)], "host string"
    )
    # cache covers h0..h7: fetched_at = i*2, ttl = 10, now = 18
    #   i*2 + 10 > 18 iff i >= 5 (h4 dies exactly at its deadline)
    cache = spark.createDataFrame(
        [(f"h{i}", i * 2, 10) for i in range(8)],
        "host string, fetched_at long, ttl_s long",
    )
    rows = {
        r["host"]: r
        for r in robots_refetch_plan(
            frontier, cache, now_s=18, n_fetchers=2, batch_size=3,
            hash_kind="md5",
        ).collect()
    }
    assert len(rows) == 12  # one decision per distinct host
    for i in range(5):
        assert rows[f"h{i}"]["status"] == "expired"
        assert rows[f"h{i}"]["action"] == "serve_stale"
    for i in range(5, 8):
        assert rows[f"h{i}"]["status"] == "fresh"
        assert rows[f"h{i}"]["action"] == "serve"
        assert rows[f"h{i}"]["shard"] == -1
        assert rows[f"h{i}"]["batch_idx"] == -1
    for i in range(8, 12):
        assert rows[f"h{i}"]["status"] == "missing"
        assert rows[f"h{i}"]["action"] == "hold"
    # scheduled work: batches bounded by 3, contiguous from 0 per shard
    sched: dict = {}
    for r in rows.values():
        if r["shard"] >= 0:
            sched.setdefault(r["shard"], []).append(r["batch_idx"])
    for shard, idxs in sched.items():
        idxs.sort()
        assert idxs[0] == 0
        for b in set(idxs):
            assert idxs.count(b) <= 3
        assert set(idxs) == set(range(max(idxs) + 1))
