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
