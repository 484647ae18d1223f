"""log2-histogram quantile sketch: brackets, merge, edge buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from cola_spark.operators.counters import (
    floor_log2,
    histogram_quantiles,
    log2_histogram,
)


def test_floor_log2_exact_at_boundaries(spark):
    vals = [1, 2, 3, 4, 7, 8, 1023, 1024, (1 << 40) - 1, 1 << 40]
    rows = (
        spark.createDataFrame([(v,) for v in vals], "v long")
        .select("v", floor_log2(F.col("v")).alias("b"))
        .collect()
    )
    got = {r.v: r.b for r in rows}
    for v in vals:
        assert got[v] == v.bit_length() - 1


def test_quantile_brackets_contain_true_quantiles(spark):
    # uniform 1..100000: exact pK = K*1000
    df = spark.range(1, 100001).select(F.col("id").alias("lat"))
    q = {
        r.permille: (r.lb, r.ub)
        for r in histogram_quantiles(log2_histogram(df, "lat")).collect()
    }
    for p, exact in [(500, 50000), (950, 95000), (990, 99000)]:
        lb, ub = q[p]
        assert lb <= exact <= ub


def test_histograms_merge_by_addition(spark):
    a = spark.range(1, 5001).select(F.col("id").alias("lat"))
    b = spark.range(5001, 20001).select(F.col("id").alias("lat"))
    whole = log2_histogram(a.unionByName(b), "lat")
    merged = (
        log2_histogram(a, "lat")
        .unionByName(log2_histogram(b, "lat"))
        .groupBy("bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_single_value_corpus(spark):
    df = spark.range(100).select(F.lit(7).cast("long").alias("lat"))
    rows = histogram_quantiles(log2_histogram(df, "lat")).collect()
    assert all(r.bucket == 2 and r.lb == 4 and r.ub == 7 for r in rows)
