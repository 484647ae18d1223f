"""Batched DNS cache plan + conditional-GET revalidation plan.

Semantics pinned here (beyond the DuckDB oracle pair):
  * TTL boundary is strict: resolved_at + ttl_s == now is EXPIRED
    (a cache entry dies at its deadline, not after it);
  * hits do zero resolver work (shard/batch -1, cached ip served);
  * resolver batches are bounded by batch_size and per-shard batch
    indices are contiguous from 0;
  * re-resolution is stable: an expired host gets the same ip_key the
    cache held (the deterministic resolver is a pure function of host);
  * revalidation requires a validator: prior row with NULL etag is a
    full fetch even though the URL was crawled before;
  * bytes_saved sums exactly the 304 rows' prior content lengths.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cola_spark.operators.dnscache import dns_cache_plan, resolve_ip_key
from cola_spark.operators.revalidate import revalidate_plan


@pytest.fixture(scope="module")
def plan(spark):
    frontier = spark.createDataFrame(
        [(f"h{i}",) for i in range(20) for _ in range(3)], "host string"
    )
    # cache covers hosts 0..9: resolved_at = i, ttl = 10, now = 10
    #   -> i + 10 > 10 iff i >= 1: h0 expired exactly at its deadline
    cache = spark.createDataFrame(
        [(f"h{i}", f"ip{i}", i, 10) for i in range(10)],
        "host string, ip_key string, resolved_at long, ttl_s long",
    )
    return dns_cache_plan(
        frontier, cache, now_s=10, n_resolvers=3, batch_size=2
    ).collect()


def test_dns_status_partition(plan):
    by = {r["host"]: r for r in plan}
    assert len(by) == 20  # distinct hosts, one decision each
    assert by["h0"]["status"] == "expired"  # deadline is strict
    for i in range(1, 10):
        assert by[f"h{i}"]["status"] == "hit"
    for i in range(10, 20):
        assert by[f"h{i}"]["status"] == "miss"


def test_dns_hits_serve_cache_without_resolver(plan):
    hits = [r for r in plan if r["status"] == "hit"]
    assert all(r["shard"] == -1 and r["batch_idx"] == -1 for r in hits)
    assert all(r["ip_key"] == "ip" + r["host"][1:] for r in hits)


def test_dns_batches_bounded_and_contiguous(plan):
    work = [r for r in plan if r["status"] != "hit"]
    assert all(0 <= r["shard"] < 3 for r in work)
    from collections import Counter

    per_batch = Counter((r["shard"], r["batch_idx"]) for r in work)
    assert all(n <= 2 for n in per_batch.values())  # batch_size bound
    for s in {r["shard"] for r in work}:
        idxs = sorted({b for (sh, b) in per_batch if sh == s})
        assert idxs == list(range(len(idxs)))  # contiguous from 0


def test_dns_re_resolution_is_stable(spark, plan):
    # expired h0's new ip_key equals what the resolver would have
    # produced at first resolution — the cache entry is refreshable
    # in place without invalidating downstream connection state
    expired = next(r for r in plan if r["host"] == "h0")
    fresh = (
        spark.range(1)
        .select(resolve_ip_key(F.lit("h0")).alias("k"))
        .first()["k"]
    )
    assert expired["ip_key"] == fresh


@pytest.fixture(scope="module")
def reval(spark):
    candidates = spark.range(12).select(F.col("id").alias("url_id"))
    # prior: urls 0..7 crawled; even ones sent an ETag, odd ones none
    prior = spark.createDataFrame(
        [(i, f"e{i}" if i % 2 == 0 else None, 100 + i) for i in range(8)],
        "url_id long, etag string, content_len long",
    )
    # change_mod=5: the seeded parity marks validated keys 0,2 changed
    # and 4,6 unchanged — both conditional-GET outcomes are present
    # (mod 3 happens to mark ALL four changed; a valid plan, but it
    # leaves the 304 branch untested)
    return (
        revalidate_plan(candidates, prior, change_mod=5),
        candidates,
        prior,
    )


def test_reval_actions(reval):
    plan, _, _ = reval
    rows = {r["url_id"]: r for r in plan.collect()}
    assert len(rows) == 12
    for i in range(12):
        if i < 8 and i % 2 == 0:
            assert rows[i]["action"] == "revalidate"
        else:  # never crawled, or crawled but validator-less
            assert rows[i]["action"] == "fetch_full"
            assert not rows[i]["not_modified"]
            assert rows[i]["bytes_saved"] == 0


def test_reval_bytes_saved_accounting(reval):
    plan, _, prior = reval
    rows = plan.collect()
    saved = sum(r["bytes_saved"] for r in rows)
    by_len = {r["url_id"]: r["content_len"] for r in prior.collect()}
    expect = sum(
        by_len[r["url_id"]] for r in rows if r["not_modified"]
    )
    assert saved == expect > 0
    # every 304 is a revalidate; no fetch_full row claims savings
    assert all(
        r["action"] == "revalidate" for r in rows if r["not_modified"]
    )


def test_reval_change_rate_floor(reval):
    # with change_mod=5 the deterministic parity must mark SOME
    # validated pages changed (200) and some unchanged (304) — both
    # branches of the conditional-GET outcome are exercised
    plan, _, _ = reval
    rev = [r for r in plan.collect() if r["action"] == "revalidate"]
    assert any(r["not_modified"] for r in rev)
    assert any(not r["not_modified"] for r in rev)


@pytest.fixture(scope="module")
def ipcut(spark):
    from cola_spark.operators.dnscache import ip_politeness_cut

    # 6 hosts x 10 urls; hosts a,b,c share ip1; d,e share ip2; f alone
    frontier = spark.createDataFrame(
        [(h, 1, i * 6 + ord(h)) for h in "abcdef" for i in range(10)],
        "host string, prio int, seq long",
    )
    resolution = spark.createDataFrame(
        [("a", "ip1"), ("b", "ip1"), ("c", "ip1"),
         ("d", "ip2"), ("e", "ip2"), ("f", "ip3")],
        "host string, ip_key string",
    )
    return ip_politeness_cut(
        frontier, resolution, host_cap=4, ip_cap=7
    ).collect()


def test_ip_cut_host_cap_binds(ipcut):
    from collections import Counter

    per_host = Counter(r["host"] for r in ipcut)
    assert all(n <= 4 for n in per_host.values())


def test_ip_cut_ip_cap_binds_on_colocated(ipcut):
    from collections import Counter

    per_ip = Counter(r["ip_key"] for r in ipcut)
    # ip1 fronts 3 hosts x cap 4 = 12 survivors, cut to the IP cap 7;
    # ip2 (2 hosts x 4 = 8) likewise; ip3's lone host passes untouched
    assert per_ip["ip1"] == 7
    assert per_ip["ip2"] == 7
    assert per_ip["ip3"] == 4


def test_ip_cut_keeps_fifo_order(ipcut):
    # within an IP, granted rows are the (prio, seq, host)-smallest of
    # the host-capped survivors — no host starves below its own head
    ip1 = sorted(
        (r for r in ipcut if r["ip_key"] == "ip1"),
        key=lambda r: (r["prio"], r["seq"], r["host"]),
    )
    assert [r["ip_rank"] for r in ip1] == list(range(1, 8))
    assert all(r["host_rank"] <= 4 for r in ip1)


def test_bytes_budget_strict_prefix(spark):
    from cola_spark.operators.budget import bytes_budget_cut

    # one host: costs 100,100,900,50 in FIFO order, budget 300 — the
    # 900-byte row blocks the queue even though the trailing 50 fits
    frontier = spark.createDataFrame(
        [("h", 1, 1, 100), ("h", 1, 2, 100), ("h", 1, 3, 900),
         ("h", 1, 4, 50)],
        "host string, prio int, seq long, expected_len long",
    )
    got = bytes_budget_cut(frontier, byte_budget=300, default_len=10)
    rows = sorted(got.collect(), key=lambda r: r["seq"])
    assert [r["seq"] for r in rows] == [1, 2]
    assert [r["cum_bytes"] for r in rows] == [100, 200]


def test_bytes_budget_null_costed_at_default(spark):
    from cola_spark.operators.budget import bytes_budget_cut

    frontier = spark.createDataFrame(
        [("h", 1, 1, None), ("h", 1, 2, None), ("h", 1, 3, None)],
        "host string, prio int, seq long, expected_len long",
    )
    got = bytes_budget_cut(frontier, byte_budget=250, default_len=100)
    assert sorted(r["seq"] for r in got.collect()) == [1, 2]


def test_connection_wave_plan_semantics(spark):
    from cola_spark.operators.dnscache import connection_wave_plan

    granted = spark.createDataFrame(
        [("h", r) for r in range(1, 8)], "host string, host_rank long"
    )
    rows = sorted(
        connection_wave_plan(granted, max_conns=3).collect(),
        key=lambda r: r["host_rank"],
    )
    # ranks 1..7 over 3 connections: slots cycle 0,1,2 and each slot's
    # waves count up — slot s serves ranks s+1, s+4, s+7 in FIFO order
    assert [r["conn_slot"] for r in rows] == [0, 1, 2, 0, 1, 2, 0]
    assert [r["wave"] for r in rows] == [0, 0, 0, 1, 1, 1, 2]
    for s in (0, 1, 2):
        mine = [r for r in rows if r["conn_slot"] == s]
        ranks = [r["host_rank"] for r in mine]
        assert ranks == sorted(ranks)  # per-connection FIFO preserved
