"""Re-expression of cola's bloom-dedup unit tests (tests/test_bloom_filter.py,
test_dedup.py) as DataFrame assertions — BASELINE.json:6."""

from pyspark.sql import functions as F

from cola_spark.operators.dedup import admit, prepare_frontier


def _frontier(spark, rows):
    # rows: (url, priority, seq, force)
    return prepare_frontier(
        spark.createDataFrame(rows, "url string, priority int, seq long, force boolean")
    )


def test_exist_or_add_semantics(spark):
    seen = spark.createDataFrame([], "url_hash long")
    batch = _frontier(
        spark,
        [
            ("http://a.example/1", 0, 0, False),
            ("http://a.example/1", 0, 1, False),   # dup in batch → dropped
            ("http://a.example/1#f", 0, 2, False),  # canonical dup → dropped
            ("http://b.example/2", 0, 3, False),
        ],
    )
    admitted, new_seen = admit(batch, seen)
    got = {(r.url, r.seq) for r in admitted.collect()}
    assert got == {("http://a.example/1", 0), ("http://b.example/2", 3)}
    assert new_seen.count() == 2


def test_seen_across_batches_no_false_negatives(spark):
    seen = spark.createDataFrame([], "url_hash long")
    b1 = _frontier(spark, [(f"http://h.example/{i}", 0, i, False) for i in range(50)])
    a1, ns1 = admit(b1, seen)
    seen = seen.unionByName(ns1)
    # batch 2 repeats all of batch 1 + 10 new
    b2 = _frontier(
        spark,
        [(f"http://h.example/{i}", 0, 100 + i, False) for i in range(60)],
    )
    a2, ns2 = admit(b2, seen)
    got = sorted(r.url for r in a2.collect())
    assert got == [f"http://h.example/{i}" for i in range(50, 60)]
    assert ns2.count() == 10


def test_force_bypasses_and_does_not_mark_seen(spark):
    seen = spark.createDataFrame([], "url_hash long")
    b1 = _frontier(spark, [("http://h.example/x", 0, 0, True)])
    a1, ns1 = admit(b1, seen)
    assert a1.count() == 1 and ns1.count() == 0  # force not added to seen
    # same URL later as non-force: still admitted (was never marked seen)
    b2 = _frontier(spark, [("http://h.example/x", 0, 5, False)])
    a2, ns2 = admit(b2, seen)
    assert a2.count() == 1 and ns2.count() == 1
    # force re-put after seen: still admitted (re-crawl semantics)
    seen = seen.unionByName(ns2)
    b3 = _frontier(spark, [("http://h.example/x", 0, 9, True)])
    a3, _ = admit(b3, seen)
    assert a3.count() == 1


def test_first_wins_within_batch_is_min_seq(spark):
    seen = spark.createDataFrame([], "url_hash long")
    batch = _frontier(
        spark,
        [
            ("http://h.example/y", 2, 7, False),
            ("http://h.example/y", 0, 3, False),
            ("http://h.example/y", 1, 11, False),
        ],
    )
    admitted, _ = admit(batch, seen)
    rows = admitted.collect()
    assert len(rows) == 1 and rows[0].seq == 3 and rows[0].priority == 0


def test_resolve_redirects_chains_cycles_budget(spark):
    """Hand graph: straight chains resolve with exact hop counts, a
    2-cycle and an over-budget chain are flagged, non-redirecting
    URLs pass through untouched."""
    from cola_spark.operators.dedup import resolve_redirects
    import pyspark.sql.functions as F  # noqa: N812

    fr = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",), ("x",), ("y",), ("l0",), ("solo",)],
        "url string",
    )
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"),      # 3-chain, exactly budget
         ("x", "y"), ("y", "x"),                  # 2-cycle
         ("l0", "l1"), ("l1", "l2"), ("l2", "l3"), ("l3", "l4")],  # 4-chain
        "src string, dst string",
    )
    got = {
        r.url: (r.final_url, r.hops, r.is_cycle)
        for r in resolve_redirects(fr, edges, max_hops=3).collect()
    }
    assert got["a"] == ("d", 3, False)
    assert got["b"] == ("d", 2, False)
    assert got["c"] == ("d", 1, False)
    assert got["d"] == ("d", 0, False)
    assert got["solo"] == ("solo", 0, False)
    assert got["x"][2] and got["y"][2]            # cycle flagged
    assert got["l0"] == ("l3", 3, True)           # budget exhausted mid-chain
