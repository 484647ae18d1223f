"""Fixed-k audit sampling, curriculum phase ordering, consensus image
dedup, content-length integrity audit, and the fetch-dispatch capstone
composition.

Semantics pinned here (beyond the DuckDB oracle pairs):
  * audit_sample: exactly min(k, |stratum|) rows per stratum, rerun-
    deterministic, and membership does NOT change when an unrelated
    payload column changes (the hash reads only the key);
  * curriculum_plan: phases are contiguous step ranges (every head
    step < every middle step < every tail step) and the within-phase
    order is NOT the quality order (the mix de-correlates);
  * consensus_dedup_pairs: caption fingerprint normalizes case and
    surrounding whitespace; consensus only when both signals agree;
  * content_length_audit: NULL Content-Length is unverifiable ->
    exact; wasted_bytes counts truncated bodies only;
  * fetch_dispatch_plan-style composition: a robots-missing host's
    URLs are held (absent), stale hosts proceed, every granted row's
    cumulative bytes fit the budget, and each keep-alive slot serves
    its waves in FIFO dispatch order.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from cola_spark.operators.budget import bytes_budget_cut
from cola_spark.operators.dnscache import (
    connection_wave_plan,
    ip_politeness_cut,
)
from cola_spark.operators.multimodal import consensus_dedup_pairs
from cola_spark.operators.revalidate import content_length_audit
from cola_spark.operators.robots import robots_refetch_plan
from cola_spark.operators.sampling import audit_sample
from cola_spark.operators.selection import curriculum_plan


def test_audit_sample_fixed_k(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}", f"payload{i}") for i in range(60)]
        + [(100, "tiny", "x"), (101, "tiny", "y")],
        "doc_id long, source string, text string",
    )
    out = audit_sample(docs, k=4, stratum_col="source", hash_kind="md5")
    rows = out.collect()
    by: dict = {}
    for r in rows:
        by.setdefault(r["source"], []).append(r)
    assert {s: len(v) for s, v in by.items()} == {
        "s0": 4, "s1": 4, "s2": 4, "tiny": 2,  # min(k, |stratum|)
    }
    # rerun-deterministic
    again = {
        (r["doc_id"], r["sample_rank"])
        for r in audit_sample(
            docs, k=4, stratum_col="source", hash_kind="md5"
        ).collect()
    }
    assert again == {(r["doc_id"], r["sample_rank"]) for r in rows}
    # membership is a function of the KEY only, not payload content
    docs2 = docs.withColumn("text", F.concat(F.col("text"), F.lit("!")))
    changed = {
        (r["doc_id"], r["sample_rank"])
        for r in audit_sample(
            docs2, k=4, stratum_col="source", hash_kind="md5"
        ).collect()
    }
    assert changed == again


def test_curriculum_phases_contiguous_and_mixed(spark):
    scored = spark.createDataFrame(
        [(i, (i * 7) % 90) for i in range(90)],
        "doc_id long, mean_millilog long",
    )
    rows = curriculum_plan(scored, hash_kind="md5").collect()
    assert len(rows) == 90
    steps = sorted(rows, key=lambda r: r["curriculum_step"])
    assert [r["curriculum_step"] for r in steps] == list(range(1, 91))
    # phases are contiguous step ranges in tier order
    tiers = [r["tier"] for r in steps]
    assert tiers == sorted(tiers)
    assert tiers.count(1) == 30 and tiers.count(2) == 30
    # within the head phase the step order is NOT the quality order
    head = [r for r in steps if r["tier"] == 1]
    qranks = [r["q_rank"] for r in head]
    assert qranks != sorted(qranks)  # mixed, not quality-sorted
    assert set(qranks) == set(range(1, 31))  # but exactly the head docs


def test_consensus_normalized_caption(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 2), (2, 3, 3)],
        "img_a long, img_b long, hamming long",
    )
    caps = spark.createDataFrame(
        [(1, "A Red Fox"), (2, "  a red fox  "), (3, "a red ox")],
        "image_id string, caption string",
    ).withColumn("image_id", F.col("image_id").cast("long"))
    rows = {
        (r["img_a"], r["img_b"]): r
        for r in consensus_dedup_pairs(pairs, caps).collect()
    }
    assert rows[(1, 2)]["caption_match"] and rows[(1, 2)]["consensus"]
    assert not rows[(1, 3)]["caption_match"]
    assert not rows[(2, 3)]["consensus"]


def test_content_length_audit_rollup(spark):
    fetches = spark.createDataFrame(
        [
            ("h1", 100, 100),   # exact
            ("h1", 100, 60),    # truncated, 60 wasted
            ("h1", 100, 117),   # overrun
            ("h1", None, 999),  # no header -> unverifiable -> exact
            ("h2", 50, 50),
        ],
        "host string, claimed_len long, body_len long",
    )
    rows = {r["host"]: r for r in content_length_audit(fetches).collect()}
    h1 = rows["h1"]
    assert (h1["fetches"], h1["truncated"], h1["overrun"], h1["exact"]) == (
        4, 1, 1, 2,
    )
    assert h1["truncated_permille"] == 250
    assert h1["wasted_bytes"] == 60
    assert rows["h2"]["exact"] == 1 and rows["h2"]["wasted_bytes"] == 0


@pytest.fixture(scope="module")
def dispatch(spark):
    # hostA: never fetched robots -> HOLD; hostB fresh; hostC expired
    frontier = spark.createDataFrame(
        [(h, 1, i, 100) for h in ("hostA", "hostB", "hostC")
         for i in range(10)],
        "host string, prio int, seq long, expected_len long",
    )
    rcache = spark.createDataFrame(
        [("hostB", 80, 40), ("hostC", 10, 40)],
        "host string, fetched_at long, ttl_s long",
    )
    plan = robots_refetch_plan(
        frontier, rcache, now_s=90, n_fetchers=2, batch_size=4,
        hash_kind="md5",
    )
    allowed = frontier.join(
        plan.filter(F.col("action") != "hold").select("host"), "host"
    )
    resolution = allowed.select("host").distinct().select(
        "host", F.lit("ip0").alias("ip_key")
    )
    cut = ip_politeness_cut(allowed, resolution, host_cap=8, ip_cap=100)
    granted = bytes_budget_cut(cut, byte_budget=450, default_len=100)
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy("prio", "seq")
    ranked = granted.withColumn(
        "dispatch_rank", F.row_number().over(w).cast("long")
    )
    return connection_wave_plan(
        ranked, max_conns=2, rank_col="dispatch_rank"
    ).collect()


def test_dispatch_hold_and_budget(dispatch):
    hosts = {r["host"] for r in dispatch}
    assert hosts == {"hostB", "hostC"}  # hostA held (robots unknown)
    for r in dispatch:
        assert r["cum_bytes"] <= 450  # strict egress budget
    # 450 // 100 = 4 rows per host survive both cuts
    assert len(dispatch) == 8


def test_dispatch_slots_fifo(dispatch):
    by_slot: dict = {}
    for r in dispatch:
        assert r["conn_slot"] == (r["dispatch_rank"] - 1) % 2
        assert r["wave"] == (r["dispatch_rank"] - 1) // 2
        by_slot.setdefault((r["host"], r["conn_slot"]), []).append(r)
    for members in by_slot.values():
        members.sort(key=lambda r: r["wave"])
        seqs = [r["seq"] for r in members]
        assert seqs == sorted(seqs)  # each slot serves FIFO in wave order


def _py_priority_sample(rows, k, m_bits=20):
    """Sequential reference for priority_sample: same md5-family hash,
    same integer priorities, same (q DESC, key) order."""
    import hashlib

    two_m = 1 << m_bits

    def h60(s):
        return int(hashlib.md5(f"psamp:{s}".encode()).hexdigest()[:15], 16)

    pri = sorted(
        ((w * two_m) // ((h60(key) % two_m) + 1), key, w)
        for key, w in rows
    )
    pri = sorted(pri, key=lambda t: (-t[0], t[1]))
    tau = pri[k][0] if len(pri) > k else 0
    return {
        key: (w, q, rank + 1, tau, max(w, tau))
        for rank, (q, key, w) in enumerate(pri[:k])
    }


def test_priority_sample_matches_sequential_reference(spark):
    from cola_spark.operators.sampling import priority_sample

    rows = [(f"host{i}", (i * 37) % 101 + 1) for i in range(40)]
    items = spark.createDataFrame(rows, "host string, w long")
    out = priority_sample(
        items, k=7, key_col="host", weight_col="w", hash_kind="md5"
    ).collect()
    ref = _py_priority_sample(rows, k=7)
    assert len(out) == 7
    got = {
        r["host"]: (r["w"], r["q"], r["sample_rank"], r["tau"], r["w_hat"])
        for r in out
    }
    assert got == ref
    # estimator invariants: q >= w always; w_hat = max(w, tau); tau > 0
    # in the sampling regime (population 40 > k)
    for r in out:
        assert r["q"] >= r["w"]
        assert r["tau"] > 0
        assert r["w_hat"] == max(r["w"], r["tau"])


def test_priority_sample_take_all_regime(spark):
    """Population <= k degenerates to take-all: tau = 0, w_hat = w
    exactly (the scheme's exact regime — no estimator variance)."""
    from cola_spark.operators.sampling import priority_sample

    items = spark.createDataFrame(
        [("a", 5), ("b", 17), ("c", 2)], "host string, w long"
    )
    out = priority_sample(
        items, k=10, key_col="host", weight_col="w", hash_kind="md5"
    ).collect()
    assert len(out) == 3
    assert all(r["tau"] == 0 and r["w_hat"] == r["w"] for r in out)
    assert sorted(r["sample_rank"] for r in out) == [1, 2, 3]


def test_priority_sample_topk_is_take_ordered(spark):
    """The k+1 cut must compile to TakeOrderedAndProject (distributed
    partial top-k), not a global Sort — the property that keeps the
    operator key-scale at a 10^10-key frontier."""
    from cola_spark.operators.sampling import priority_sample

    items = spark.createDataFrame(
        [(f"h{i}", i + 1) for i in range(50)], "host string, w long"
    ).repartition(8)
    plan = priority_sample(
        items, k=5, key_col="host", weight_col="w", hash_kind="md5"
    )._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
