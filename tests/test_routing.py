"""Rendezvous (HRW) routing: the minimal-disruption contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cola_spark.operators.routing import rendezvous_owner, rendezvous_route


def _py_md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_owner(url: str, n: int) -> int:
    best_w, best_s = 0, _py_md5_60(f"hrw:{url}|0")
    for w in range(1, n):
        s = _py_md5_60(f"hrw:{url}|{w}")
        if s > best_s:
            best_w, best_s = w, s
    return best_w


def _urls(spark, n=2000):
    return spark.range(n).select(
        F.concat(F.lit("http://h"), F.pmod("id", F.lit(31)).cast("string"),
                 F.lit(".example.com/p"), F.col("id").cast("string")).alias("url")
    )


def test_owner_matches_sequential_replay(spark):
    rows = rendezvous_route(_urls(spark, 300), n_before=8, n_after=9).collect()
    for r in rows:
        assert r.owner_before == _py_owner(r.url, 8)
        assert r.owner_after == _py_owner(r.url, 9)
        assert r.moved == (r.owner_before != r.owner_after)


def test_all_movement_flows_to_the_new_node(spark):
    out = rendezvous_route(_urls(spark), n_before=8, n_after=9)
    moved = out.filter("moved").collect()
    assert moved, "some keys must move when the pool grows"
    assert all(r.owner_after == 8 for r in moved)


def test_moved_fraction_near_one_over_w_plus_one(spark):
    out = rendezvous_route(_urls(spark, 4000), n_before=8, n_after=9)
    frac = out.filter("moved").count() / 4000
    # expected 1/9 ~= 0.111; a mod-hash router would move 8/9 ~= 0.889
    assert 0.07 < frac < 0.16


def test_removal_moves_only_the_dead_nodes_keys(spark):
    # shrink 9 -> 8 == the inverse relation: keys NOT owned by worker 8
    # under 9 workers keep their owner under 8 workers
    u = _urls(spark, 1500)
    both = u.select(
        "url",
        rendezvous_owner(F.col("url"), 9).alias("o9"),
        rendezvous_owner(F.col("url"), 8).alias("o8"),
    )
    stayed = both.filter("o9 <> 8").filter("o8 <> o9").count()
    assert stayed == 0


def test_xxhash64_family_routes_and_balances(spark):
    out = rendezvous_route(_urls(spark, 4000), n_before=8, n_after=9,
                           hash_kind="xxhash64")
    per = out.groupBy("owner_before").count().collect()
    assert len(per) == 8
    counts = [r["count"] for r in per]
    assert min(counts) > 4000 / 8 * 0.6 and max(counts) < 4000 / 8 * 1.5
