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
