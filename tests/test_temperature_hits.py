"""Semantic pins for the round-5 late batch: temperature_alloc
(alpha=1/2 mixture rebalancing, operators/sampling.py) and hits_scores
(integer-grid HITS, operators/linkrank.py). Cross-engine equivalence of
the full queries is covered by the driver gate (temperature_mix /
hits_hub_authority); these pin the operator semantics on planted inputs
where the right answer is computable by hand."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cola_spark.operators.linkrank import hits_scores
from cola_spark.operators.sampling import isqrt_col, temperature_alloc


# --- exact integer square root ------------------------------------------


def test_isqrt_exact_incl_perfect_squares(spark):
    # the adversarial band: perfect squares and their neighbors, where
    # FLOOR(SQRT(double)) alone can over/under-shoot by one
    vals = []
    for k in (0, 1, 2, 3, 1000, 10**6, 2**26 - 1):
        for d in (-1, 0, 1):
            v = k * k + d
            if v >= 0:
                vals.append(v)
    vals += [2, 5, 99, 10**12 + 7, (1 << 52) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.s for r in df.select("x", isqrt_col("x").alias("s")).collect()}
    for v in vals:
        assert got[v] == math.isqrt(v), (v, got[v], math.isqrt(v))


# --- temperature allocation ---------------------------------------------


def _stats(spark, rows):
    return spark.createDataFrame(rows, "stratum string, n_docs long")


def test_temperature_alloc_sums_to_capacity_exactly(spark):
    s = _stats(spark, [("en", 10_000), ("de", 100), ("yo", 1)])
    out = temperature_alloc(s, capacity=997)
    assert out.agg(F.sum("granted")).first()[0] == 997


def test_temperature_alloc_flattens_the_head(spark):
    # en has 100x de's docs; at alpha=1/2 its grant must be ~10x (sqrt
    # of the ratio), NOT 100x — the whole point of the temperature
    s = _stats(spark, [("en", 10_000), ("de", 100)])
    got = {r.stratum: r for r in temperature_alloc(s, 1100).collect()}
    ratio = got["en"].granted / got["de"].granted
    assert 9.0 <= ratio <= 11.0, ratio
    # and the tail's per-doc keep rate is HIGHER than the head's
    assert got["de"].sample_permille > got["en"].sample_permille


def test_temperature_alloc_monotone_and_equal_on_ties(spark):
    s = _stats(spark, [("a", 400), ("b", 400), ("c", 100)])
    got = {r.stratum: r.granted for r in temperature_alloc(s, 1000).collect()}
    assert got["a"] >= got["c"] and got["b"] >= got["c"]
    assert abs(got["a"] - got["b"]) <= 1  # largest-remainder tie split
    # sqrt(400)/sqrt(100) = 2: a gets ~2x c
    assert 1.8 <= got["a"] / got["c"] <= 2.2


# --- HITS ----------------------------------------------------------------


def _hits_ref(edges, iters=2, s0=1_000_000):
    """Sequential reference with the exact integer normalization."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    e = sorted(set(edges))
    hub = {n: s0 for n in nodes}
    auth = {}
    for _ in range(iters):
        raw_a = {}
        for u, v in e:
            raw_a[v] = raw_a.get(v, 0) + hub[u]
        ta = sum(raw_a.values())
        auth = {n: (s0 * raw_a.get(n, 0)) // ta for n in nodes}
        raw_h = {}
        for u, v in e:
            raw_h[u] = raw_h.get(u, 0) + auth[v]
        th = sum(raw_h.values())
        hub = {n: (s0 * raw_h.get(n, 0)) // th for n in nodes}
    return {n: (hub[n], auth[n]) for n in nodes}


def test_hits_matches_sequential_reference(spark):
    edges = [(1, 4), (2, 4), (3, 4), (1, 5), (2, 5), (4, 6), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.host: (r.hub, r.authority) for r in hits_scores(df, iters=2).collect()}
    assert got == _hits_ref(edges)


def test_hits_hub_authority_split(spark):
    # 1,2,3 all point at 4; 4 points at nothing else pointed-to, so 4
    # is the authority and 1 (who also hits 5) the best hub; nodes with
    # no in-edges have authority exactly 0, no out-edges hub exactly 0
    edges = [(1, 4), (2, 4), (3, 4), (1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.host: r for r in hits_scores(df, iters=2).collect()}
    assert got[4].authority == max(r.authority for r in got.values())
    assert got[1].hub == max(r.hub for r in got.values())
    for n in (1, 2, 3):  # roots: nothing points at them
        assert got[n].authority == 0
    for n in (4, 5):  # sinks: point at nothing
        assert got[n].hub == 0
