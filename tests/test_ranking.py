"""Two-phase global ranking: exact equivalence to the single-partition
window, stability across evaluations, and the scale property (no
row-scale data through an Exchange SinglePartition)."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cola_spark.operators.ranking import global_rank


@pytest.fixture(scope="module")
def data(spark):
    # keys with duplicates in the prefix columns + unique seq tiebreaker,
    # spanning many range partitions
    return (
        spark.range(20000)
        .select(
            (F.col("id") % 7).cast("int").alias("priority"),
            F.format_string("h%02d", F.pmod(F.xxhash64("id"), F.lit(40))).alias("host"),
            F.col("id").alias("seq"),
        )
        .persist()
    )


def test_matches_single_window_exactly(data):
    keys = ["priority", "host", "seq"]
    got = {r.seq: r.global_rank for r in global_rank(data, keys, parts=16).collect()}
    w = Window.orderBy(*keys)
    exp = {
        r.seq: r.global_rank
        for r in data.withColumn("global_rank", F.row_number().over(w).cast("long")).collect()
    }
    assert got == exp


def test_stable_across_evaluations(data):
    """Range-bound sampling must not flip ranks between evaluations of
    the same DataFrame (exchange reuse pins one partitioning)."""
    df = global_rank(data, ["priority", "host", "seq"], parts=8)
    a = sorted((r.seq, r.global_rank) for r in df.collect())
    b = sorted((r.seq, r.global_rank) for r in df.collect())
    assert a == b
    ranks = [g for _, g in a]
    assert sorted(ranks) == list(range(1, len(ranks) + 1))  # a permutation: exact, no dupes


def _single_partition_exchanges_feed_only_aggregates(df) -> bool:
    """True iff every Exchange SinglePartition in the executed plan sits
    directly above an aggregate (i.e. it moves per-partition counts, not
    row-scale data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" in ln:
            below = "\n".join(lines[i + 1 : i + 4])
            if "HashAggregate" not in below:
                return False
    return True


def test_no_rowscale_single_partition_exchange(data):
    df = global_rank(data, ["priority", "host", "seq"], parts=8)
    assert _single_partition_exchanges_feed_only_aggregates(df)


def test_flagship_plan_has_no_rowscale_single_partition(spark):
    from cola_spark.flagship import flagship

    df = flagship(spark, "/root/testdata/sf0.001")
    assert _single_partition_exchanges_feed_only_aggregates(df)


def test_empty_and_single_row(spark):
    empty = spark.createDataFrame([], "a int, seq long")
    assert global_rank(empty, ["a", "seq"], parts=4).count() == 0
    one = spark.createDataFrame([(1, 5)], "a int, seq long")
    rows = global_rank(one, ["a", "seq"], parts=4).collect()
    assert [(r.a, r.seq, r.global_rank) for r in rows] == [(1, 5, 1)]
