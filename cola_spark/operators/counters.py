"""Counters & metrics — cola's CounterServer/CounterClient re-expressed.

Reference (cola/functions/counter.py ~L10-200): global and per-worker
counters with combiner classes (acc/max/min/merge); clients cache
locally and sync periodically (a hand-rolled partial→final two-phase
aggregation); persisted to counter.info. Spark gives the two-phase
merge for free (partial+final hash agg); live per-job counters ride
df.observe (see scheduler step 1).

This module materializes the north-rule metrics surface
(BASELINE.json:14 "per-partition lineage and fetch/dedup/requeue
metrics"):

  * metrics_by_partition — per (round, part) fetch/error/retry counts,
    where part is the host-hash partition key the frontier shuffles on
  * lineage — per crawled row: full provenance chain (who discovered
    it, when it was scheduled, its rank and outcome)
  * round_metrics — manifest history as a DataFrame (secs, scheduled)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cola_spark.operators.fetch import CHILD_SEQ_OFFSET


def metrics_by_partition(crawl_log: DataFrame, n_parts: int = 32) -> DataFrame:
    """(round, part, scheduled, fetched_ok, errors, retries): partial
    aggregation per host-hash partition — the per-partition metrics the
    checkpoint manifest points at."""
    return (
        crawl_log.withColumn("part", F.pmod(F.xxhash64("host"), F.lit(n_parts)).cast("int"))
        .groupBy("round", "part")
        .agg(
            F.count("*").alias("scheduled"),
            F.sum(F.col("fetch_ok").cast("long")).alias("fetched_ok"),
            F.sum((~F.col("fetch_ok")).cast("long")).alias("errors"),
            F.sum((F.col("error_times") > 0).cast("long")).alias("retries"),
        )
    )


def lineage(crawl_log: DataFrame) -> DataFrame:
    """Per-row provenance: parent seq (for discovered links), generation
    (0 = seed), schedule position. The child-seq encoding
    (parent*4 + i + 10^12 per generation, operators/fetch.py) is
    invertible, so lineage needs no extra state."""
    seq = F.col("seq")
    off = CHILD_SEQ_OFFSET
    # child seq ranges per generation: gen g children land in
    # [sum_{k<g} 4^k * off, ...) — exact integer boundaries, no float log
    gen = (
        F.when(seq < off, 0)
        .when(seq < 5 * off, 1)
        .when(seq < 21 * off, 2)
        .when(seq < 85 * off, 3)
        .otherwise(4)
    )
    parent = F.when(seq < off, F.lit(None).cast("long")).otherwise(
        F.floor((seq - off) / 4)
    )
    return crawl_log.select(
        "url_canon", "host", "round", "priority", "seq", "host_rank",
        "fetch_ok", "error_times",
        parent.alias("parent_seq"),
        gen.alias("generation"),
        (seq >= off).alias("is_discovered"),
    )


def round_metrics(spark: SparkSession, workdir: str) -> DataFrame:
    """The manifest history as a DataFrame (cola's counter.info file →
    queryable table)."""
    mf = os.path.join(workdir, "manifest.json")
    with open(mf) as f:
        hist = json.load(f).get("history", [])
    if not hist:
        return spark.createDataFrame([], "round int, scheduled long, secs double")
    rows = [
        (h.get("round"), h.get("scheduled", 0), float(h.get("secs", 0.0)))
        for h in hist
    ]
    return spark.createDataFrame(rows, "round int, scheduled long, secs double")


# ---------------------------------------------------------------------
# Latency quantile sketch (round 5): cola's speed controller keys on
# MEAN fetch time per worker (cola/core/rpc speed units, SURVEY §2 row
# 22); a production scheduler keys politeness and timeout policy on
# TAIL latency (p95/p99). Exact quantiles need a global sort; the
# standard fix is a fixed-bucket histogram sketch: log2 buckets →
# counts (≤ ~40 keys at any corpus size, map-side combinable,
# MERGEABLE by addition across rounds/nodes — test-pinned), quantile =
# first bucket whose cumulative count reaches ceil(q·n/1000), answered
# as the bucket's [2^b, 2^(b+1)-1] bound pair. Relative error ≤ 2× by
# construction (one-bucket resolution), integer-exact cross-engine —
# floor(log2 v) is computed with the branch-free smear+popcount idiom
# (v |= v>>1 ... v>>32; bit_count(v)-1), no floats anywhere.


def floor_log2(c):
    """floor(log2(v)) for v >= 1, branch-free: smear the top bit right
    then popcount. 6 OR-shifts + one bit_count, all codegen scalars."""
    m = c.cast("long")
    for s in (1, 2, 4, 8, 16, 32):
        m = m.bitwiseOR(F.shiftright(m, s))
    return (F.bit_count(m) - 1).cast("long")


def log2_histogram(df: DataFrame, value_col: str) -> DataFrame:
    """(bucket, cnt) over floor(log2(value)); values must be >= 1.
    The sketch state: add counts bucketwise to merge."""
    return (
        df.select(floor_log2(F.col(value_col)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame, permilles: tuple = (500, 950, 990)
) -> DataFrame:
    """Quantile bounds from a log2 histogram: one row per requested
    permille — (permille, n, rank_needed, bucket, lb, ub) with
    lb = 2^bucket, ub = 2^(bucket+1)-1 bracketing the true quantile.
    Everything after the histogram is config-scale (≤ 64 buckets ×
    len(permilles) rows)."""
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        F.sum("cnt").over(w).cast("long").alias("cum"),
    ).crossJoin(hist.agg(F.sum("cnt").cast("long").alias("n")))
    targets = hist.sparkSession.createDataFrame(
        [(int(p),) for p in permilles], "permille long"
    )
    need = F.expr("(permille * n + 999) div 1000")
    sel = (
        F.broadcast(targets)
        .join(cum, cum["cum"] >= need)
        .groupBy("permille")
        .agg(
            F.max("n").alias("n"),
            F.min("bucket").cast("long").alias("bucket"),
        )
    )
    return sel.select(
        "permille",
        "n",
        F.expr("(permille * n + 999) div 1000").cast("long")
        .alias("rank_needed"),
        "bucket",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bucket AS INT))")
        .alias("lb"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(bucket + 1 AS INT)) - 1"
        ).alias("ub"),
    )


def log2_histogram_by(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """(key, bucket, cnt) — the keyed twin of log2_histogram (e.g. a
    per-HOST latency sketch instead of the cluster-wide one). Same
    mergeable state, one map-side-combinable groupBy; the key fan-out
    is bounded by keys × ≤64 buckets."""
    return (
        df.select(
            F.col(key_col).alias("key"),
            floor_log2(F.col(value_col)).alias("bucket"),
        )
        .groupBy("key", "bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def histogram_quantile_by(hist: DataFrame, permille: int = 950) -> DataFrame:
    """(key, bucket, ub) — per-key quantile bucket upper bound from a
    keyed log2 histogram: the smallest bucket whose cumulative count
    reaches ceil(permille·n/1000). The cumulative window partitions by
    key over ≤64 bucket rows — key-scale work, never corpus-scale."""
    w = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "key", "bucket", F.sum("cnt").over(w).cast("long").alias("cum")
    )
    tot = hist.groupBy("key").agg(F.sum("cnt").cast("long").alias("n"))
    sel = (
        cum.join(tot, "key")
        .filter(F.col("cum") >= F.expr(f"({permille} * n + 999) div 1000"))
        .groupBy("key")
        .agg(F.min("bucket").cast("long").alias("bucket"))
    )
    return sel.select(
        "key",
        "bucket",
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(bucket + 1 AS INT)) - 1"
        ).alias("ub"),
    )
