"""BPE merge training (operators/bpe.py) against a hand-computed
replay — pair counts weighted by word frequency, the (count DESC,
lpiece, rpiece) tie-break, and the leftmost-non-overlapping merge rule
('aaa' merges to ('aa','a'), never ('a','aa'))."""

from __future__ import annotations

from cola_spark.operators.bpe import bpe_merges


def _run(spark, rows, merges=4):
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = bpe_merges(docs, merges=merges).collect()
    return [(r.merge_rank, r.lpiece, r.rpiece, r.pair_freq) for r in out]


def test_hand_replayed_merges(spark):
    # vocab: low:3 lower:2 newest:4 widest:1 aaa:2 baa:1
    # round1 pair counts: w-e 6 (lower 2 + newest 4); l-o/o-w/e-s/s-t/a-a 5
    # round2: tie at 5 between l-o, s-t, a-a -> 'a' wins the lexical tie
    # round3: l-o vs s-t at 5 -> 'l'; round4: s-t 5
    got = _run(
        spark,
        [("d1", "low low low lower lower newest newest newest newest widest"),
         ("d2", "aaa aaa baa")],
    )
    assert got == [(1, "w", "e", 6), (2, "a", "a", 5),
                   (3, "l", "o", 5), (4, "s", "t", 5)]


def test_overlap_rule_leftmost(spark):
    # 'aaaa' x1: matches at pos 1,2,3 -> keep 1 and 3 (even offsets):
    # round1 a-a count = 3; after merge: (aa, aa) so round2 = (aa, aa, 1)
    got = _run(spark, [("d", "aaaa")], merges=2)
    assert got == [(1, "a", "a", 3), (2, "aa", "aa", 1)]


def test_frequency_weighting(spark):
    # 'xy' repeated 5 times beats 'zz zz zz zz' (4 words, 1 pair each)
    got = _run(spark, [("d", "xy xy xy xy xy zz zz zz zz")], merges=1)
    assert got == [(1, "x", "y", 5)]
