"""HyperLogLog sketch: replay, mergeability, accuracy, regimes."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from cola_spark.operators.cardinality import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _urls(spark, n, prefix="u"):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url")
    )


def _py_registers(keys, m=256, rmax=40):
    regs = [0] * m
    for k in keys:
        h = int(hashlib.md5(f"hll:{k}".encode()).hexdigest()[:15], 16)
        b, w = h % m, h // m
        r = 53 if w == 0 else min((w ^ (w - 1)).bit_count(), 53)
        regs[b] = max(regs[b], min(r, rmax))
    return regs


def test_registers_match_sequential_replay(spark):
    keys = [f"u{i}" for i in range(5000)]
    got = {
        r.bucket: r.register
        for r in hll_registers(_urls(spark, 5000)).collect()
    }
    exp = _py_registers(keys)
    assert [got[b] for b in range(256)] == exp


def test_merge_equals_sketch_of_union(spark):
    a = hll_registers(_urls(spark, 3000))
    b = hll_registers(_urls(spark, 3000, prefix="v"))
    merged = {r.bucket: r.register for r in hll_merge(a, b).collect()}
    union = {
        r.bucket: r.register
        for r in hll_registers(
            _urls(spark, 3000).unionByName(_urls(spark, 3000, prefix="v"))
        ).collect()
    }
    assert merged == union


def test_estimate_within_three_sigma(spark):
    # sigma ~= 1.04/sqrt(256) = 6.5%; duplicates must not inflate it
    u = _urls(spark, 20000).unionByName(_urls(spark, 20000))
    est = hll_estimate(hll_registers(u)).collect()[0].est
    assert abs(est - 20000) / 20000 < 0.20


def test_empty_input_gives_raw_floor_not_zero(spark):
    # no linear-counting correction by design: all-zero registers give
    # the documented raw floor alpha*m = 183, and n_empty exposes the
    # small-range regime to the caller
    row = hll_estimate(
        hll_registers(_urls(spark, 0))
    ).collect()[0]
    assert row.n_empty == 256 and row.est == 183


def test_xxhash64_family_estimates_too(spark):
    est = hll_estimate(
        hll_registers(_urls(spark, 10000), hash_kind="xxhash64")
    ).collect()[0].est
    assert abs(est - 10000) / 10000 < 0.20
