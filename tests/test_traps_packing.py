"""Semantics of the round-5 late operators: crawler-trap signals,
trainer-sequence packing, LM-coverage scoring, tf-idf extraction.
(The cross-engine oracles live in test_oracle_pairs via PAIRS.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from cola_spark.operators.packing import pack_offsets
from cola_spark.operators.textstats import lm_coverage, tfidf_topk
from cola_spark.operators.traps import trap_signals


def test_trap_signals_hand_cases(spark):
    rows = [
        (1, "/a/b/c"),                          # clean: depth 3, no repeat
        (2, "/x/y/x/y/x/y/x"),                  # cycle: 'x' appears 4x
        (3, "/1/2/3/4/5/6/7/8/9"),              # deep: depth 9 > 8
        (4, "/p/p/p"),                          # repeat 3 < 4: not a trap
    ]
    df = spark.createDataFrame(rows, "url_key long, url string")
    got = {
        r["url_key"]: r
        for r in trap_signals(df, max_depth=8, min_repeat=4).collect()
    }
    assert got[1]["depth"] == 3 and got[1]["max_repeat"] == 1
    assert not got[1]["is_trap"]
    assert got[2]["max_repeat"] == 4 and got[2]["is_trap"]
    assert got[3]["depth"] == 9 and got[3]["is_trap"]
    assert got[4]["max_repeat"] == 3 and not got[4]["is_trap"]


def test_pack_offsets_layout(spark):
    # one shard so the layout is a single stream: offsets must tile
    # [0, total) contiguously in doc_id order, bins by integer div.
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in [(0, 3), (1, 5), (2, 4), (3, 2)]],
        "doc_id long, text string",
    )
    rows = sorted(
        pack_offsets(docs, ctx_len=4, n_shards=1).collect(),
        key=lambda r: r["doc_id"],
    )
    assert [r["start_off"] for r in rows] == [0, 3, 8, 12]
    assert [r["n_tok"] for r in rows] == [3, 5, 4, 2]
    # doc 1 spans tokens [3, 8) → bins 0..1; doc 3 spans [12, 14) → bin 3
    assert (rows[1]["first_bin"], rows[1]["last_bin"]) == (0, 1)
    assert (rows[3]["first_bin"], rows[3]["last_bin"]) == (3, 3)
    # every doc's bin range is consistent with its offsets
    for r in rows:
        assert r["first_bin"] == r["start_off"] // 4
        assert r["last_bin"] == (r["start_off"] + r["n_tok"] - 1) // 4


def test_pack_offsets_sharded_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i} tok{i + 1} tok{i + 2}") for i in range(40)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r for r in pack_offsets(docs, 8, 4, "md5").collect()}
    b = {r["doc_id"]: r for r in pack_offsets(docs, 8, 4, "md5").collect()}
    assert a == b  # rerun-stable
    # within each shard offsets tile contiguously from 0
    by_shard: dict[int, list] = {}
    for r in a.values():
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:
            assert r["start_off"] == off
            off += r["n_tok"]


def test_lm_coverage_planted(spark):
    # md5('lmref:...') permille: pick ids so we control the ref side.
    from cola_spark.operators.sampling import permille_bucket

    probe = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    ).select(
        "doc_id",
        permille_bucket(F.col("doc_id"), "md5", "lmref").alias("b"),
    )
    buckets = {r["doc_id"]: r["b"] for r in probe.collect()}
    ref_ids = [i for i, b in buckets.items() if b < 250]
    non_ids = [i for i, b in buckets.items() if b >= 250]
    assert ref_ids and len(non_ids) >= 2
    fluent = "the cat sat on the mat"
    rows = [(ref_ids[0], fluent)]          # ref doc defines the inventory
    rows.append((non_ids[0], fluent))      # non-ref, fully covered
    rows.append((non_ids[1], "zq9 xv7 kk3 jj2"))  # gibberish: zero overlap
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in lm_coverage(docs, ref_permille=250, hash_kind="md5").collect()
    }
    assert got[ref_ids[0]]["is_ref"] and got[ref_ids[0]]["coverage_permille"] == 1000
    assert not got[non_ids[0]]["is_ref"]
    assert got[non_ids[0]]["coverage_permille"] == 1000
    assert got[non_ids[1]]["coverage_permille"] == 0
    assert got[non_ids[1]]["n_bigrams"] == 3 and got[non_ids[1]]["n_known"] == 0


def test_tfidf_topk_ranks(spark):
    docs = spark.createDataFrame(
        [
            (0, "apple apple banana shared"),
            (1, "banana cherry shared shared"),
            (2, "cherry shared"),
        ],
        "doc_id long, text string",
    )
    got = tfidf_topk(docs, k=2).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r["doc_id"], r["rnk"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 0: apple tf=2 df=1 → score 2*3e6; 'shared' df=3 idf=1e6 tf=1;
    # banana df=2. Top-2 = apple, banana.
    assert [r["term"] for r in by_doc[0]] == ["apple", "banana"]
    assert by_doc[0][0]["score"] == 2 * 3_000_000
    assert by_doc[0][1]["score"] == 1_500_000
    # every doc returns at most k rows, ranks are 1..k
    for rows in by_doc.values():
        assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_no_size_estimate_broadcasts(spark):
    """The corpus-derived join sides (trap rep agg, lm ref inventory,
    tf-idf dfreq) are frontier/vocab-scale at 10^10 rows: Catalyst's
    local size estimate must never broadcast them (bloom-gate rule).
    The only broadcast allowed in tfidf is the 1-row n_docs scalar."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    urls = spark.createDataFrame(
        [(i, f"/a/b/c{i}") for i in range(50)], "url_key long, url string"
    )
    p = _plan(trap_signals(urls))
    assert "ShuffledHashJoin" in p and "BroadcastHashJoin" not in p
    p = _plan(lm_coverage(docs))
    assert "ShuffledHashJoin" in p and "BroadcastHashJoin" not in p
    # opt-in broadcast for a genuinely bounded curated inventory
    p = _plan(lm_coverage(docs, broadcast_ref=True))
    assert "BroadcastHashJoin" in p
    p = _plan(tfidf_topk(docs))
    assert "ShuffledHashJoin" in p
    assert "BroadcastHashJoin" not in p  # n_docs rides a nested-loop join


def test_image_mix_filter_gates(spark):
    """Every curated row satisfies all four metadata gates, and the
    pHash dedup kept at most one exemplar per planted near-dup cluster
    (exactness vs DuckDB is pinned by the pair test)."""
    from cola_spark.queries import PAIRS, _planted_phash_pairs

    out = PAIRS["image_mix_filter"][0](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows
    kept = {r["doc_id"] for r in rows}
    for r in rows:
        assert min(r["w"], r["h"]) >= 200
        assert max(r["w"], r["h"]) <= 3 * min(r["w"], r["h"])
        assert r["fmt"] in ("png", "jpgq")
        assert 3 <= r["n_cap"] <= 256
    # no two kept docs are directly pHash-near-dup survivors of the
    # same planted pair (the CC keeps one exemplar per component)
    pairs = _planted_phash_pairs(spark, "/root/testdata/sf0.001").collect()
    both_kept = [(p["img_a"], p["img_b"]) for p in pairs
                 if p["img_a"] in kept and p["img_b"] in kept]
    assert both_kept == []


def test_safety_gate_hand_cases(spark):
    from cola_spark.operators.safety import safety_gate

    rows = [
        (1, "good clean words here", "srcA"),        # admit
        (2, "bad bad bad ok", "srcA"),               # 750 permille: cut
        (3, "good clean words here", "srcX"),        # blocked source
        (4, "bad good good good good good good good good good", "srcA"),
        # 1 unsafe / 10 tok = 100 permille > 80: cut
        (5, "bad " + "good " * 19 + "end", "srcA"),  # 1/21 = 47: admit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: r
        for r in safety_gate(
            df, blocked_sources=["srcX"], unsafe_terms=["bad"],
            max_unsafe_permille=80,
        ).collect()
    }
    assert got[1]["admit"] and got[1]["n_unsafe"] == 0
    assert not got[2]["admit"] and got[2]["unsafe_permille"] == 750
    assert not got[3]["admit"] and got[3]["blocked"]
    assert got[3]["unsafe_permille"] <= 80  # blocked, not lexicon-cut
    assert not got[4]["admit"] and got[4]["unsafe_permille"] == 100
    assert got[5]["admit"] and got[5]["n_unsafe"] == 1
    # decision columns are self-consistent everywhere
    for r in got.values():
        assert r["admit"] == ((not r["blocked"]) and r["unsafe_permille"] <= 80)


def test_aspect_bucket_pack_layout(spark):
    from cola_spark.operators.packing import aspect_bucket_pack

    rows = [
        (0, 512, 512),    # exactly 1:1
        (1, 1024, 768),   # exactly 4:3
        (2, 768, 1024),   # exactly 3:4
        (3, 1920, 1080),  # exactly 16:9
        (4, 1000, 501),   # near 2:1
        (5, 515, 512),    # near 1:1 (ties/closest -> bucket 0)
        (6, 512, 512),
        (7, 513, 512),
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long, h long")
    got = {
        r["doc_id"]: r
        for r in aspect_bucket_pack(df, batch_size=2, n_shards=1).collect()
    }
    # exact ratios land in their own bucket, metric 0
    assert (got[0]["bw"], got[0]["bh"]) == (1, 1)
    assert (got[1]["bw"], got[1]["bh"]) == (4, 3)
    assert (got[2]["bw"], got[2]["bh"]) == (3, 4)
    assert (got[3]["bw"], got[3]["bh"]) == (16, 9)
    assert (got[4]["bw"], got[4]["bh"]) == (2, 1)
    for d in (5, 6, 7):
        assert (got[d]["bw"], got[d]["bh"]) == (1, 1)
    # within (bucket, shard): doc-id order tiles batches of 2
    ones = sorted(
        (r["doc_id"], r["batch_idx"], r["slot"])
        for r in got.values()
        if r["bucket"] == 0
    )
    assert [(b, s) for _, b, s in ones] == [(0, 0), (0, 1), (1, 0), (1, 1)]


def test_aspect_bucket_tie_breaks_to_earlier_bucket(spark):
    from cola_spark.operators.packing import aspect_bucket_pack

    # w=3,h=2 is equidistant (common-denominator metric) from some
    # pairs only by construction; pin the deterministic pick instead:
    # run twice, identical output (determinism), and every row's
    # chosen bucket minimizes the exact fraction distance.
    from fractions import Fraction

    from cola_spark.operators.packing import ASPECT_BUCKETS

    rows = [(i, 200 + 37 * i, 200 + 11 * (i % 13)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, w long, h long")
    a = sorted(aspect_bucket_pack(df).collect(), key=lambda r: r["doc_id"])
    b = sorted(aspect_bucket_pack(df).collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    for r in a:
        d = abs(Fraction(r["w"], r["h"]) - Fraction(r["bw"], r["bh"]))
        best = min(
            abs(Fraction(r["w"], r["h"]) - Fraction(bw, bh))
            for bw, bh in ASPECT_BUCKETS
        )
        assert d == best, (r["doc_id"], r["w"], r["h"], r["bw"], r["bh"])
        # tie -> the EARLIEST ladder bucket achieving the minimum
        first = next(
            (bw, bh)
            for bw, bh in ASPECT_BUCKETS
            if abs(Fraction(r["w"], r["h"]) - Fraction(bw, bh)) == best
        )
        assert (r["bw"], r["bh"]) == first
