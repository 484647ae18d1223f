"""Semantic pins for the training-data selection operators
(operators/selection.py, operators/safety.py::url_blocklist_score).
The DuckDB oracle equivalence of the full pipelines is covered by
test_oracle_pairs (dsir_importance_mix / ccnet_quality_tiers /
docs_simpson_concentration / url_blocklist_score); these tests pin the
operator-level semantics on planted inputs where the right answer is
computable by hand."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from cola_spark.operators.safety import url_blocklist_score
from cola_spark.operators.selection import (
    dsir_select,
    dsir_weights,
    quality_tiers,
    raw_grams,
    unigram_concentration,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_raw_grams_multiplicity_and_short_doc_exclusion(spark):
    d = _docs(spark, [(1, "a b a b", "s"), (2, "only", "s")])
    got = sorted(
        (r.doc_id, r.gram) for r in raw_grams(d, n=2).collect()
    )
    # doc 1: bigrams with multiplicity — "a b" TWICE (no per-doc
    # distinct), "b a" once; doc 2 has < 2 words → excluded.
    assert got == [(1, "a b"), (1, "a b"), (1, "b a")]


def test_dsir_weights_prefer_target_vocabulary(spark):
    # target doc (src3) uses vocabulary X; two raw docs, one sharing X,
    # one disjoint — the sharer must out-weigh the stranger.
    d = _docs(
        spark,
        [
            (1, "alpha beta alpha beta alpha beta", "src3"),
            (2, "alpha beta alpha beta", "web"),
            (3, "zig zag zig zag", "web"),
        ],
    )
    w = {
        r.doc_id: r.dsir_weight
        for r in dsir_weights(d, F.col("source") == "src3").collect()
    }
    assert w[2] > w[3]
    assert w[1] >= w[2]


def test_dsir_select_cut_is_ceil_quarter_and_ranks_total_order(spark):
    rows = [(i, f"tok{i} tok{i + 1} tok{i + 2}", "src3" if i < 2 else "web")
            for i in range(10)]
    out = dsir_select(_docs(spark, rows), F.col("source") == "src3").collect()
    assert sorted(r.sel_rank for r in out) == list(range(1, 11))
    assert sum(r.selected for r in out) == 3  # ceil(10/4)
    by_rank = sorted(out, key=lambda r: r.sel_rank)
    # selected is exactly the rank prefix
    assert [r.selected for r in by_rank] == [True] * 3 + [False] * 7
    # rank respects (weight DESC, doc_id ASC)
    for a, b in zip(by_rank, by_rank[1:]):
        assert (a.dsir_weight, -a.doc_id) >= (b.dsir_weight, -b.doc_id)


def test_quality_tiers_even_division(spark):
    scored = spark.createDataFrame(
        [(i, 100 - i) for i in range(7)], "doc_id long, mean_millilog long"
    )
    out = {r.doc_id: (r.q_rank, r.tier, r.tier_label)
           for r in quality_tiers(scored).collect()}
    # 7 docs, 3 tiers, tier = ((rank-1)*3) DIV 7 + 1 → sizes 3/2/2
    assert [out[i][0] for i in range(7)] == [1, 2, 3, 4, 5, 6, 7]
    assert [out[i][1] for i in range(7)] == [1, 1, 1, 2, 2, 3, 3]
    assert out[0][2] == "head" and out[3][2] == "middle" and out[6][2] == "tail"


def test_unigram_concentration_hand_computed(spark):
    d = _docs(spark, [(1, "a a a b", "s"), (2, "x y z", "s"), (3, "solo", "s")])
    got = {r.doc_id: r for r in unigram_concentration(d).collect()}
    # doc 1: N=4, counts {a:3, b:1}, coll = 3*2 = 6 → 1e6*6/12 = 500000
    assert (got[1].n_tokens, got[1].n_distinct, got[1].simpson_ppm) == (4, 2, 500000)
    # doc 2: all distinct → 0
    assert got[2].simpson_ppm == 0
    # doc 3: N=1 → excluded (index undefined)
    assert 3 not in got


def test_url_blocklist_substring_scoring(spark):
    urls = spark.createDataFrame(
        [(1, "http://h00.parts.shop/hot-red-hot"),
         (2, "http://h01.parts.shop/new-plate"),
         (3, "http://h02.parts.shop/cold-bolt")],
        "k long, url string",
    )
    got = {r.k: (r.block_score, r.url_blocked)
           for r in url_blocklist_score(urls).collect()}
    assert got[1] == (2 * 5 + 3, True)   # hot×2, red×1
    assert got[2] == (0, False)
    assert got[3] == (1, False)          # 'old' inside 'cold' — substring semantics


def test_url_blocklist_plan_is_scan_project_only(spark):
    urls = spark.range(8).select(
        F.format_string("http://h/%d-hot", F.col("id")).alias("url")
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        url_blocklist_score(urls).explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_yield_alloc_sums_to_capacity_and_prefers_yield(spark):
    from cola_spark.operators.budget import yield_alloc

    stats = spark.createDataFrame(
        [("a", 10, 50), ("b", 10, 5), ("c", 10, 0), ("d", 3, 17)],
        "host string, fetched long, discovered long",
    )
    out = {r.host: r for r in yield_alloc(stats, 100).collect()}
    assert sum(r.granted for r in out.values()) == 100
    # weights: a=1+5000, b=1+500, c=1 (smoothing floor), d=1+5666
    assert out["d"].granted > out["a"].granted > out["b"].granted
    assert out["c"].granted >= 0
    assert out["c"].yield_weight == 1


def test_yield_alloc_largest_remainder_hand_case(spark):
    from cola_spark.operators.budget import yield_alloc

    # weights 1+1000 each (discovered == fetched): 3 equal hosts, C=10
    # → base 3 each, leftover 1 goes to the smallest host name.
    stats = spark.createDataFrame(
        [("x", 5, 5), ("y", 5, 5), ("z", 5, 5)],
        "host string, fetched long, discovered long",
    )
    out = {r.host: r.granted for r in yield_alloc(stats, 10).collect()}
    assert out == {"x": 4, "y": 3, "z": 3}


def test_route_load_report_salting_levels_skew(spark):
    from cola_spark.operators.routing import route_load_report

    # one pathological host carrying 90% of the frontier
    rows = [("hot", i) for i in range(900)] + [(f"h{i}", i) for i in range(100)]
    f = spark.createDataFrame(rows, "host string, seq long")
    got = {r.strategy: r for r in route_load_report(f).collect()}
    assert got["naive"].total == got["salted"].total == 1000
    # naive: the hot host's 900 rows land on ONE partition
    assert got["naive"].max_load >= 900
    # salted: spread over 8 buckets
    assert got["salted"].max_load < 300
    assert got["salted"].skew_permille < got["naive"].skew_permille


def test_age_priorities_starved_url_overtakes(spark):
    from cola_spark.operators.priority import age_priorities

    pending = spark.createDataFrame(
        # seq 1: priority 2 (worst), enqueued round 0 → waited 12 → eff 0
        # seq 2: priority 0 (best), enqueued round 11 → waited 1 → eff 0
        # seq 3: priority 2, enqueued round 10 → waited 2 → eff 2
        [("h", 2, 1, 0), ("h", 0, 2, 11), ("h", 2, 3, 10)],
        "host string, priority int, seq long, enqueue_round long",
    )
    out = {r.seq: r for r in age_priorities(pending, current_round=12).collect()}
    assert (out[1].effective_priority, out[1].waited_rounds) == (0, 12)
    assert out[2].effective_priority == 0
    assert out[3].effective_priority == 2
    # the starved URL now ties the fresh high-priority one and wins
    # FIFO within the level (seq 1 < seq 2); the fresh low-prio waits.
    order = sorted(out.values(), key=lambda r: (r.effective_priority, r.seq))
    assert [r.seq for r in order] == [1, 2, 3]
    # floor: effective priority never goes negative
    deep = age_priorities(pending, current_round=99).collect()
    assert all(r.effective_priority >= 0 for r in deep)


def test_keyed_histogram_quantile(spark):
    from cola_spark.operators.counters import (
        histogram_quantile_by,
        log2_histogram_by,
    )

    # host a: 99 fast (1 ms, bucket 0) + 1 slow (1000 ms, bucket 9)
    #   → p95 needs rank 95 ≤ cum(bucket 0)=99 → bucket 0, ub 1
    # host b: 10 at 1 ms + 90 at 100 ms (bucket 6)
    #   → p95 rank 95 > 10 → bucket 6, ub 127
    rows = [("a", 1)] * 99 + [("a", 1000)] + [("b", 1)] * 10 + [("b", 100)] * 90
    df = spark.createDataFrame(rows, "host string, lat long")
    out = {
        r.key: (r.bucket, r.ub)
        for r in histogram_quantile_by(
            log2_histogram_by(df, "host", "lat"), permille=950
        ).collect()
    }
    assert out["a"] == (0, 1)
    assert out["b"] == (6, 127)
