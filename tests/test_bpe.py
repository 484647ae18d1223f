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


def test_bpe_encode_hand_case(spark):
    """Encode with a FIXED rule table (not retrained): rules applied in
    rank order with leftmost-non-overlap; counts are per doc."""
    from cola_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "aaaa")], "doc_id long, text string"
    )
    rules = spark.createDataFrame(
        [(1, "a", "b"), (2, "ab", "ab")],
        "merge_rank long, lpiece string, rpiece string",
    )
    got = {r["doc_id"]: r for r in bpe_encode(docs, rules).collect()}
    # doc 1: "abab" -> a b a b -> ab ab -> abab (1 piece); "ab" -> ab (1)
    assert (got[1]["n_words"], got[1]["n_pieces"], got[1]["n_chars"]) == (2, 2, 6)
    # doc 2: "aaaa" -> rule (a,b) no match; rule (ab,ab) no match -> 4 pieces
    assert (got[2]["n_words"], got[2]["n_pieces"], got[2]["n_chars"]) == (1, 4, 4)


def test_bpe_encode_empty_rules_is_char_count(spark):
    from cola_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame([(1, "xy z")], "doc_id long, text string")
    rules = spark.createDataFrame(
        [], "merge_rank long, lpiece string, rpiece string"
    )
    r = bpe_encode(docs, rules).collect()[0]
    assert (r["n_words"], r["n_pieces"], r["n_chars"]) == (2, 3, 3)
