"""Integer-grid PageRank invariants (operators/linkrank.py): exact
hand-replayed values on a cycle, authority ordering on a star,
teleport floor for source-only nodes, checkpoint-mode equivalence,
partitioning invariance."""

import math

from pyspark.sql import functions as F

from cola_spark.operators.linkrank import D_DEN, D_NUM, R0, host_pagerank


def _ranks(df):
    return {r.host: r.rank for r in df.collect()}


def test_cycle_exact_hand_replay(spark):
    """3-cycle, out_deg 1 everywhere: every iteration applies
    r' = tele + floor(d*r/100) identically to all nodes — replay the
    exact integer sequence in Python."""
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    got = _ranks(host_pagerank(e, iters=3))
    tele = (R0 * (D_DEN - D_NUM)) // D_DEN
    r = R0
    for _ in range(3):
        r = tele + math.floor((D_NUM * r) / (D_DEN * 1.0))
    assert got == {0: r, 1: r, 2: r}


def test_star_hub_outranks_spokes_and_source_floor(spark):
    """5 spokes → 1 hub: the hub accumulates in-mass, spokes (no
    in-edges) settle at the teleport floor after the first iteration."""
    e = spark.createDataFrame(
        [(s, 99) for s in range(5)], "src long, dst long"
    )
    got = _ranks(host_pagerank(e, iters=3))
    tele = (R0 * (D_DEN - D_NUM)) // D_DEN
    for s in range(5):
        assert got[s] == tele, "source-only node must sit at the teleport floor"
    assert got[99] > 5 * tele, "hub must accumulate spoke mass"


def test_checkpoint_modes_identical(spark):
    e = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(30)], "src long, dst long"
    )
    a = _ranks(host_pagerank(e, iters=4, checkpoint=True))
    b = _ranks(host_pagerank(e, iters=4, checkpoint=False))
    assert a == b


def test_partitioning_invariance(spark):
    rows = [(i % 13, (i * 5 + 1) % 13) for i in range(60)]
    e1 = spark.createDataFrame(rows, "src long, dst long").repartition(2)
    e2 = spark.createDataFrame(rows, "src long, dst long").repartition(11)
    assert _ranks(host_pagerank(e1, iters=3)) == _ranks(host_pagerank(e2, iters=3))


def test_anchor_rollup_hand_case(spark):
    from cola_spark.operators.linkrank import anchor_rollup

    rows = [
        # target A: "nice page" x2 (hosts h1,h2), "a page" x2 (h1,h1)
        # -> tie on cnt=2, lexicographically smaller "a page" wins
        ("h1", "A", "nice page"),
        ("h2", "A", "nice page"),
        ("h1", "A", "a page"),
        ("h1", "A", "a page"),
        # target B: single ref
        ("h3", "B", "only one"),
    ]
    df = spark.createDataFrame(rows, "src_host string, target string, anchor string")
    got = {r["target"]: r for r in anchor_rollup(df).collect()}
    assert got["A"]["n_refs"] == 4 and got["A"]["n_hosts"] == 2
    assert got["A"]["top_cnt"] == 2 and got["A"]["top_anchor"] == "a page"
    assert got["B"]["n_refs"] == 1 and got["B"]["n_hosts"] == 1
    assert got["B"]["top_anchor"] == "only one" and got["B"]["top_cnt"] == 1


def test_anchor_rollup_no_window_plan(spark):
    """The argmax is groupBys + shuffle_hash joins — no Window exec
    (a per-target window would stream every Zipf-hot target's edge
    list through one task) and no auto-broadcast of corpus-derived
    sides."""
    import io
    from contextlib import redirect_stdout

    from cola_spark.operators.linkrank import anchor_rollup

    df = spark.createDataFrame(
        [("h1", "A", "x y")], "src_host string, target string, anchor string"
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        anchor_rollup(df).explain("formatted")
    p = buf.getvalue()
    assert "Window" not in p
    assert "BroadcastHashJoin" not in p


def test_mirror_host_pairs_threshold_both_sides(spark):
    from cola_spark.operators.linkrank import mirror_host_pairs

    rows = (
        [(i, f"text {i}", "h1") for i in range(8)]
        + [(100 + i, f"text {i}", "h2") for i in range(8)]      # full mirror
        + [(200 + i, f"text {i}", "h3") for i in range(2)]      # 2/8 subset
        + [(300, "text 0", "h4"), (301, "own a", "h4"), (302, "own b", "h4")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(df, min_jaccard_x1000=500).collect()
    }
    assert set(got) == {("h1", "h2")}
    r = got[("h1", "h2")]
    assert (r["common"], r["n_a"], r["n_b"], r["jac_x1000"]) == (8, 8, 8, 1000)
    # with the threshold open, the sub-mirror overlaps appear with the
    # exact integer Jaccard values (2/8 -> 250; 1/10 -> 100)
    allp = {
        (r["host_a"], r["host_b"]): r["jac_x1000"]
        for r in mirror_host_pairs(df, min_jaccard_x1000=0).collect()
    }
    assert allp[("h1", "h3")] == 250 and allp[("h2", "h3")] == 250
    assert allp[("h1", "h4")] == 100  # 1 shared / (8 + 3 - 1)
    # duplicate text WITHIN a host counts once (distinct fingerprints)
    df2 = df.unionByName(
        spark.createDataFrame([(400, "text 0", "h1")],
                              "doc_id long, text string, source string")
    )
    r2 = {
        (r["host_a"], r["host_b"]): r
        for r in mirror_host_pairs(df2, min_jaccard_x1000=500).collect()
    }[("h1", "h2")]
    assert (r2["common"], r2["n_a"], r2["jac_x1000"]) == (8, 8, 1000)


def test_link_reciprocity_clique_vs_organic(spark):
    """A planted clique is fully reciprocal and flagged; organic chain
    links are not; the min_out floor spares small mutual pairs."""
    from cola_spark.operators.linkrank import link_reciprocity

    edges = (
        [(f"f{a}", f"f{b}") for a in range(4) for b in range(4) if a != b]
        + [("s0", "s1"), ("s1", "s2"), ("s2", "s3"), ("s3", "s0")]  # cycle
        + [("m0", "m1"), ("m1", "m0")]  # mutual pair below min_out
        + [("s0", "s0")]  # self loop dropped
    )
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.host: r for r in link_reciprocity(df).collect()}
    for a in range(4):
        r = got[f"f{a}"]
        assert r.recip_permille == 1000 and r.is_farm
    # a directed 4-cycle has zero reciprocated edges
    assert all(not got[f"s{i}"].is_farm and got[f"s{i}"].recip_out == 0
               for i in range(4))
    # mutual pair: fully reciprocal but out_deg 1 < min_out
    assert got["m0"].recip_permille == 1000 and not got["m0"].is_farm
    assert got["s0"].out_deg == 1  # self loop excluded
